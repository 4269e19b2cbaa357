"""Gap analysis for the last untried conv idea (implicit-GEMM kernel).

Before writing any fused implicit-GEMM Pallas conv (NEXT.md round-4
candidates #1), measure its THEORETICAL ceiling: a 3×3 SAME conv does the
same arithmetic as the matmul [B·H·W, 9C] × [9C, Co], so a pure XLA
matmul at that shape — no im2col cost, perfect operand layout — is a hard
upper bound on what any implicit-GEMM kernel could reach.  Compare:

  gemm9 : [M, 9C] @ [9C, Co]      — implicit-GEMM ceiling
  gemm1 : 9 × ([M, C] @ [C, Co])  — nine-shifted-pass ceiling (the
                                     existing kernels/conv.py structure)
  conv  : lax.conv_general_dilated — what the chain actually pays

Decision rule (pre-registered): if gemm9 < 1.5× conv at the f2 hot
shapes, the conv-reformulation lever is CLOSED — no kernel can repay the
lost XLA epilogue fusion (the r3 chain A/Bs measured that loss at
3-19%) — and the implicit-GEMM kernel is not built.

Timing per the axon recipe (bench_conv.py): iterations chained inside one
jitted fori_loop, one scalar sync.
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

# (B, H, C, Co) — same f2 hot shapes as tools/bench_conv.py
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


def main():
    dt = jnp.bfloat16
    print(f"# iters={ITERS} dtype=bf16 backend={jax.default_backend()}")
    for bsz, h, c, co in SHAPES:
        m = bsz * h * h
        flops = 2 * m * 9 * c * co
        k = jax.random.PRNGKey(0)

        # gemm9: one deep-contraction matmul (implicit-GEMM ceiling)
        x9 = jax.random.normal(k, (m, 9 * c), dt)
        w9 = jax.random.normal(k, (9 * c, co), dt)

        def g9(xc, w9=w9):
            y = jax.lax.dot_general(xc, w9, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # feed back via an in-place slice update: the loop dependency
            # stays real but the feedback traffic is one [M, Co] slice for
            # every impl (a tile-to-full-width add would charge gemm9 9×
            # the feedback bytes of conv and distort the comparison)
            return jax.lax.dynamic_update_slice(
                xc, xc[:, :y.shape[-1]] + y.astype(dt) * 1e-6, (0, 0))

        t = timeit(g9, x9)
        print(json.dumps({"shape": [bsz, h, c, co], "impl": "gemm9",
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}))

        # gemm1: nine independent [M,C]@[C,Co] passes (shifted-tap ceiling)
        x1 = jax.random.normal(k, (m, c), dt)
        w1 = jax.random.normal(k, (9, c, co), dt)

        def g1(xc, w1=w1):
            acc = jnp.zeros((xc.shape[0], w1.shape[-1]), jnp.float32)
            for i in range(9):
                acc = acc + jax.lax.dot_general(
                    xc, w1[i], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            upd = xc[:, :min(acc.shape[-1], xc.shape[-1])]
            return jax.lax.dynamic_update_slice(
                xc, upd + acc.astype(dt)[:, :upd.shape[-1]] * 1e-6, (0, 0))

        t = timeit(g1, x1)
        print(json.dumps({"shape": [bsz, h, c, co], "impl": "gemm1",
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}))

        # the real conv
        xc = jax.random.normal(k, (bsz, h, h, c), dt)
        wc = jax.random.normal(k, (3, 3, c, co), dt)

        def cv(x, wc=wc):
            y = jax.lax.conv_general_dilated(
                x, wc, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            upd = x[..., :min(y.shape[-1], x.shape[-1])]
            return jax.lax.dynamic_update_slice(
                x, upd + y.astype(dt)[..., :upd.shape[-1]] * 1e-6,
                (0, 0, 0, 0))

        t = timeit(cv, xc)
        print(json.dumps({"shape": [bsz, h, c, co], "impl": "conv",
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}))


if __name__ == "__main__":
    main()
