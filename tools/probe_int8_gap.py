"""Gap analysis for int8 MXU arithmetic at the f2 hot conv shapes.

The one arithmetic lever never measured on this chip: v5e's MXU int8 peak
is nominally 2x its bf16 peak (394 vs 197 TOPS), and int8 operands halve
HBM traffic.  Before building any quantized serving path (per-channel
weight quant + dynamic activation quant for the f2 UNet convs, the 63%
stage of the chain), measure the CEILING exactly the way the conv lever
was closed (`probe_conv_gap.py`): pure dot_general/conv at the hot
shapes, int8 operands with int32 accumulation, against the same-shape
bf16 baselines from the same run.

Decision rule (pre-registered): build the quantized path ONLY if
int8 gemm9 >= 1.5x the measured bf16 conv at the dominant f2 shapes
(64^2x320 and 32^2x640 carry most of the stage FLOPs) AND the int8 form
actually lowers on this backend.  Below 1.5x the lever is CLOSED: the
quality risk (a diffusion chain compounds per-step error over 70 steps)
plus the quantize/dequantize VPU work and the lost conv+epilogue fusion
already measured at 3-19% (r3 chain A/Bs) cannot repay less than that.

Timing per the axon recipe: iterations chained inside one jitted
fori_loop, one scalar sync, feedback traffic held comparable across
impls (one [M, Co]-sized slice update per iteration).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

bench.enable_cache()

ITERS = int(os.environ.get("FGDM_BENCH_ITERS", "30"))

# (B, H, C, Co) — same f2 hot shapes as probe_conv_gap.py
SHAPES = [
    (8, 64, 320, 320),
    (8, 32, 640, 640),
    (8, 16, 1280, 1280),
    (8, 8, 1280, 1280),
    (8, 32, 960, 640),
]


def timeit(fn, *args, iters=ITERS, tries=3):
    def loop(x0):
        def body(_, xc):
            return fn(xc)
        return jax.lax.fori_loop(0, iters, body, x0)

    jl = jax.jit(loop)
    for attempt in range(tries):
        try:
            out = jl(*args)
            jax.block_until_ready(out)
            break
        except Exception as e:  # transient remote-compile RPC hiccups
            if attempt == tries - 1:
                raise
            print(f"# retrying after {type(e).__name__}", file=sys.stderr)
            time.sleep(5)
    t0 = time.perf_counter()
    out = jl(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def report(shape, impl, t, flops):
    print(json.dumps({"shape": list(shape), "impl": impl,
                      "ms": round(t * 1e3, 3),
                      "tflops": round(flops / t / 1e12, 1)}))


def main():
    print(f"# iters={ITERS} backend={jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    for bsz, h, c, co in SHAPES:
        m = bsz * h * h
        flops = 2 * m * 9 * c * co
        shape = (bsz, h, c, co)

        # ---- bf16 gemm9 baseline (re-measured in the same run) ----
        x9 = jax.random.normal(key, (m, 9 * c), jnp.bfloat16)
        w9 = jax.random.normal(key, (9 * c, co), jnp.bfloat16)

        def g9(xc, w9=w9):
            y = jax.lax.dot_general(xc, w9, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(
                xc, xc[:, :y.shape[-1]] + y.astype(xc.dtype) * 1e-6, (0, 0))

        report(shape, "gemm9_bf16", timeit(g9, x9), flops)

        # ---- int8 gemm9: int8 x int8 -> int32 accumulate ----
        xi = jax.random.randint(key, (m, 9 * c), -127, 128, jnp.int8)
        wi = jax.random.randint(key, (9 * c, co), -127, 128, jnp.int8)

        def g9i(xc, wi=wi):
            y = jax.lax.dot_general(xc, wi, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            # feed back one [M, Co] slice, cast to int8 (the dequant the
            # real path would pay is costlier — this is the ceiling)
            upd = xc[:, :y.shape[-1]] + (y >> 12).astype(jnp.int8)
            return jax.lax.dynamic_update_slice(xc, upd, (0, 0))

        try:
            report(shape, "gemm9_int8", timeit(g9i, xi), flops)
        except Exception as e:
            print(json.dumps({"shape": list(shape), "impl": "gemm9_int8",
                              "error": f"{type(e).__name__}: {e}"[:200]}))

        # ---- int8 weights / bf16 activations (weights-only quant form,
        # the low-quality-risk variant: halves weight traffic only) ----
        def g9w(xc, wi=wi):
            w = wi.astype(jnp.bfloat16)
            y = jax.lax.dot_general(xc, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(
                xc, xc[:, :y.shape[-1]] + y.astype(xc.dtype) * 1e-6, (0, 0))

        report(shape, "gemm9_w8a16", timeit(g9w, x9), flops)

        # ---- int8 conv (does the conv lowering accept int8 at all?) ----
        xci = jax.random.randint(key, (bsz, h, h, c), -127, 128, jnp.int8)
        wci = jax.random.randint(key, (3, 3, c, co), -127, 128, jnp.int8)

        def cvi(x, wci=wci):
            y = jax.lax.conv_general_dilated(
                x, wci, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            upd = x[..., :y.shape[-1]] + (y >> 12).astype(jnp.int8)
            return jax.lax.dynamic_update_slice(x, upd, (0, 0, 0, 0))

        try:
            report(shape, "conv_int8", timeit(cvi, xci), flops)
        except Exception as e:
            print(json.dumps({"shape": list(shape), "impl": "conv_int8",
                              "error": f"{type(e).__name__}: {e}"[:200]}))


if __name__ == "__main__":
    main()
