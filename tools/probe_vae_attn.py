"""A/B the VAE mid-attention implementation at the decode's hot shape.

tools/profile_vae.py measured the current VaeAttnBlock math ([4,4096,512]
single head, full f32 score materialization) at 81 ms / 1.7 TF/s — an
order of magnitude off both the compute and bandwidth bounds.  This tool
times candidate implementations at the same shape to pick the fix.

Prints one JSON line per variant: {"variant", "ms", "tflops_per_sec",
"max_abs_diff_vs_f32"}.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (persistent compile cache)
bench.enable_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B, N, C = 4, 64 * 64, 512
SCALE = C ** -0.5
FLOPS = B * 2 * N * N * C * 2


def _force(out):
    float(jnp.asarray(out).reshape(-1)[0])


def timed(fn, args, iters=3):
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3, out


def current_f32(q, k, v):
    """What VaeAttnBlock does today (autoencoder.py:90-94)."""
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    attn = jax.nn.softmax(jnp.einsum("bic,bjc->bij", qf, kf) * SCALE, axis=-1)
    return jnp.einsum("bij,bjc->bic", attn.astype(v.dtype), v)


def f32_default_prec(q, k, v):
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    attn = jax.nn.softmax(
        jnp.einsum("bic,bjc->bij", qf, kf,
                   precision=jax.lax.Precision.DEFAULT) * SCALE, axis=-1)
    return jnp.einsum("bij,bjc->bic", attn.astype(v.dtype), v,
                      precision=jax.lax.Precision.DEFAULT)


def bf16_scores_f32_softmax(q, k, v):
    s = jnp.einsum("bic,bjc->bij", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    attn = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bij,bjc->bic", attn.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def chunked_online(q, k, v, block=512):
    """Flash-style online softmax at the XLA level (no Pallas)."""
    qf = q.astype(jnp.float32) * SCALE

    def body(carry, kv):
        acc, m, l = carry
        kb, vb = kv
        s = jnp.einsum("bic,bjc->bij", qf, kb.astype(jnp.float32),
                       precision=jax.lax.Precision.DEFAULT)
        m_new = jnp.maximum(m, s.max(-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bij,bjc->bic", p, vb.astype(jnp.float32),
            precision=jax.lax.Precision.DEFAULT)
        return (acc, m_new, l), None

    kb = k.reshape(B, -1, block, C).swapaxes(0, 1)
    vb = v.reshape(B, -1, block, C).swapaxes(0, 1)
    acc = jnp.zeros((B, N, C), jnp.float32)
    m = jnp.full((B, N, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, N, 1), jnp.float32)
    (acc, m, l), _ = jax.lax.scan(body, (acc, m, l), (kb, vb))
    return (acc / l).astype(v.dtype)


def flash_kernel(q, k, v):
    from fgdm_tpu.kernels.attention import multihead_attention

    return multihead_attention(
        q[:, None].astype(jnp.bfloat16), k[:, None].astype(jnp.bfloat16),
        v[:, None], scale=SCALE)[:, 0]


def main():
    key = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (B, N, C), jnp.bfloat16) * 0.3
               for i in range(3))
    ref = None
    for name, fn in [
        ("current_f32", current_f32),
        ("f32_default_prec", f32_default_prec),
        ("bf16_scores_f32_softmax", bf16_scores_f32_softmax),
        ("chunked_online_512", functools.partial(chunked_online, block=512)),
        ("flash_kernel_bf16", flash_kernel),
    ]:
        try:
            ms, out = timed(jax.jit(fn), (q, k, v))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:200]}))
            sys.stdout.flush()
            continue
        out = jnp.asarray(out, jnp.float32)
        if ref is None:
            ref = out
        diff = float(jnp.max(jnp.abs(out - ref)))
        print(json.dumps({"variant": name, "ms": round(ms, 3),
                          "tflops_per_sec": round(FLOPS / ms / 1e9, 1),
                          "max_abs_diff_vs_f32": round(diff, 6)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
