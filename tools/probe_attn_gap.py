"""Shape-roof analysis for the chain's attention, companion to
probe_conv_gap.py.

Attention at the f2 hot shape ([B·h, N, d] = [64, 4096, 40]) does two
batched matmuls per head — QK^T ([N,d]×[d,N], contraction depth d=40) and
PV ([N,N]×[N,d], output width d=40).  Their pure-matmul equivalents with
perfect layout and no softmax are a hard ceiling on ANY attention kernel
at these shapes.  If the flash kernel's measured TF/s sits near that
ceiling, attention — like the convs (probe_conv_gap.py) — is at its
shape-limited roof and the chain's remaining "headroom to the 145 TF/s
practical roof" is not reachable by kernel engineering.

    python tools/probe_attn_gap.py
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

# (BH, N, d): f2 self-attention per level (CFG-doubled batch 4 ⇒ B=8,
# 8 heads) and the f1 256²-latent stage
SHAPES = [
    (64, 4096, 40),   # f2 ds=1: 64² latent, d_head 40
    (64, 1024, 80),   # f2 ds=2
    (64, 256, 160),   # f2 ds=4
    (64, 1024, 40),   # f1 ds=1: 32² latent
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
    from fgdm_tpu.kernels.attention import multihead_attention

    dt = jnp.bfloat16
    print(f"# iters={ITERS} dtype=bf16 backend={jax.default_backend()}")
    for bh, n, d in SHAPES:
        flops = 2 * bh * (n * d * n + n * n * d)  # QK^T + PV
        k = jax.random.PRNGKey(0)

        # matmul ceiling: the two attention matmuls with no softmax, no
        # masking, perfect [bh, n, d] layout
        q = jax.random.normal(k, (bh, n, d), dt)
        kv = jax.random.normal(k, (bh, n, d), dt)

        def mm(qc, kv=kv):
            s = jax.lax.dot_general(qc, kv, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(s.astype(dt), kv,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            return qc + o.astype(dt) * 1e-6

        t = timeit(mm, q)
        print(json.dumps({"shape": [bh, n, d], "impl": "matmul_ceiling",
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}))

        # the shipped flash kernel (softmax, online rescale, d padded to
        # lanes) at the same shape — 4D [B, h, N, d] API
        q4 = q.reshape(8, bh // 8, n, d)
        kv4 = kv.reshape(8, bh // 8, n, d)

        def fl(qc, kv4=kv4):
            o = multihead_attention(qc, kv4, kv4, scale=1.0)
            return qc + o.astype(dt) * 1e-6

        t = timeit(fl, q4)
        print(json.dumps({"shape": [bh, n, d], "impl": "flash",
                          "ms": round(t * 1e3, 3),
                          "tflops": round(flops / t / 1e12, 1)}))


if __name__ == "__main__":
    main()
