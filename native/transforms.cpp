// Native data-path transforms for the fgdm_tpu input pipeline.
//
// The reference's loader does per-label boolean-mask colorization and PIL
// resizes in Python (/root/reference/ldm/data/semantic.py:20-83,698-800) —
// the throughput bottleneck when feeding 512² batches to a TPU.  This
// module implements the hot per-sample transforms in C++ with a simple
// std::thread parallel-for, exposed through a C ABI consumed via ctypes
// (fgdm_tpu/data/native.py).  No external deps; image *decode* stays with
// PIL/cv2 — the wins are in colorize/resize/normalize/collate.
//
// Build: native/build.sh  →  native/libfgdm_transforms.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t workers = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (workers == 1 || n < (1 << 14)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + workers - 1) / workers;
  for (int64_t w = 0; w < workers; ++w) {
    int64_t lo = w * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// labels [N] uint8 → rgb [N,3] uint8 via cmap [n_colors,3]; 255 → white.
void fgdm_colorize_u8(const uint8_t* labels, int64_t n, const uint8_t* cmap,
                      int32_t n_colors, uint8_t* out) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint8_t l = labels[i];
      if (l == 255 || l >= n_colors) {
        out[3 * i] = out[3 * i + 1] = out[3 * i + 2] = 255;
      } else {
        const uint8_t* c = cmap + 3 * l;
        out[3 * i] = c[0];
        out[3 * i + 1] = c[1];
        out[3 * i + 2] = c[2];
      }
    }
  });
}

// rgb [N,3] uint8 → labels [N] int32 via exact cmap match; else 255.
void fgdm_decolorize_u8(const uint8_t* rgb, int64_t n, const uint8_t* cmap,
                        int32_t n_colors, int32_t* out) {
  // 24-bit LUT (16MB) amortizes over large N; built per call.
  std::vector<int32_t> lut(1 << 24, 255);
  for (int32_t c = 0; c < n_colors; ++c) {
    uint32_t key = (uint32_t(cmap[3 * c]) << 16) |
                   (uint32_t(cmap[3 * c + 1]) << 8) | cmap[3 * c + 2];
    lut[key] = c;
  }
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint32_t key = (uint32_t(rgb[3 * i]) << 16) |
                     (uint32_t(rgb[3 * i + 1]) << 8) | rgb[3 * i + 2];
      out[i] = lut[key];
    }
  });
}

// bilinear resize uint8 HWC → out_h×out_w (C channels).
void fgdm_resize_bilinear_u8(const uint8_t* src, int32_t h, int32_t w,
                             int32_t c, int32_t out_h, int32_t out_w,
                             uint8_t* dst) {
  float sy = float(h) / out_h;
  float sx = float(w) / out_w;
  parallel_for(int64_t(out_h), [&](int64_t lo, int64_t hi) {
    for (int64_t oy = lo; oy < hi; ++oy) {
      float fy = (oy + 0.5f) * sy - 0.5f;
      int32_t y0 = std::max(0, std::min(h - 1, int32_t(fy)));
      int32_t y1 = std::min(h - 1, y0 + 1);
      float wy = fy - y0;
      if (wy < 0) wy = 0;
      for (int32_t ox = 0; ox < out_w; ++ox) {
        float fx = (ox + 0.5f) * sx - 0.5f;
        int32_t x0 = std::max(0, std::min(w - 1, int32_t(fx)));
        int32_t x1 = std::min(w - 1, x0 + 1);
        float wx = fx - x0;
        if (wx < 0) wx = 0;
        for (int32_t ch = 0; ch < c; ++ch) {
          float v00 = src[(y0 * w + x0) * c + ch];
          float v01 = src[(y0 * w + x1) * c + ch];
          float v10 = src[(y1 * w + x0) * c + ch];
          float v11 = src[(y1 * w + x1) * c + ch];
          float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                    v10 * wy * (1 - wx) + v11 * wy * wx;
          dst[(oy * out_w + ox) * c + ch] = uint8_t(v + 0.5f);
        }
      }
    }
  });
}

// nearest resize (for label maps).
void fgdm_resize_nearest_u8(const uint8_t* src, int32_t h, int32_t w,
                            int32_t c, int32_t out_h, int32_t out_w,
                            uint8_t* dst) {
  float sy = float(h) / out_h;
  float sx = float(w) / out_w;
  parallel_for(int64_t(out_h), [&](int64_t lo, int64_t hi) {
    for (int64_t oy = lo; oy < hi; ++oy) {
      int32_t y = std::min(h - 1, int32_t((oy + 0.5f) * sy));
      for (int32_t ox = 0; ox < out_w; ++ox) {
        int32_t x = std::min(w - 1, int32_t((ox + 0.5f) * sx));
        std::memcpy(dst + (oy * out_w + ox) * c, src + (y * w + x) * c, c);
      }
    }
  });
}

// uint8 [N] → float32 [N] scaled to [-1, 1].
void fgdm_normalize_f32(const uint8_t* src, int64_t n, float* dst) {
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      dst[i] = src[i] * (1.0f / 127.5f) - 1.0f;
    }
  });
}

// Fused per-sample pipeline: colorize labels → resize(nearest) → normalize.
// labels [h,w] uint8, out [out_h*out_w*3] float32.
void fgdm_label_to_tensor(const uint8_t* labels, int32_t h, int32_t w,
                          const uint8_t* cmap, int32_t n_colors,
                          int32_t out_h, int32_t out_w, float* out) {
  std::vector<uint8_t> rgb(size_t(h) * w * 3);
  fgdm_colorize_u8(labels, int64_t(h) * w, cmap, n_colors, rgb.data());
  std::vector<uint8_t> resized(size_t(out_h) * out_w * 3);
  fgdm_resize_nearest_u8(rgb.data(), h, w, 3, out_h, out_w, resized.data());
  fgdm_normalize_f32(resized.data(), int64_t(out_h) * out_w * 3, out);
}

}  // extern "C"
