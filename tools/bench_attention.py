"""Microbenchmark: attention kernel variants at the chain's hot shapes.

The axon tunnel is asynchronous — ``block_until_ready`` returns before the
compute lands, so per-op timing lies.  This harness chains ``ITERS``
attention calls inside one jitted ``fori_loop`` (each iteration feeds the
output back as q, serializing real work) and synchronizes with a scalar
host readback.

Shapes: factor-2 512² self-attn at ds=1 → [B=8(batch4×CFG), H=8, N=4096,
d=40]; ds=2 → [8, 8, 1024, 80]; factor-1 256² ds=1 → [8, 8, 1024, 40].
Run on the real TPU: `PYTHONPATH=/root/.axon_site:. python tools/bench_attention.py`.
"""

import functools
import math
import time

import jax
import jax.numpy as jnp

import fgdm_tpu.kernels.attention as ka

ITERS = 50


def timeit(step, q, k, v):
    """step: one attention call. Returns seconds per call."""

    @jax.jit
    def chain(q, k, v):
        def body(_, acc):
            return step(acc, k, v)

        out = jax.lax.fori_loop(0, ITERS, body, q)
        return jnp.sum(out)

    float(chain(q, k, v))  # compile + warmup (host sync)
    t0 = time.perf_counter()
    float(chain(q, k, v))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = jax.random.PRNGKey(0)
    for (b, h, n, d) in [(8, 8, 4096, 40), (8, 8, 1024, 80),
                         (8, 8, 1024, 40)]:
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, h, n, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, n, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, n, d), jnp.float32)
        scale = 1 / math.sqrt(d)
        flops = 2 * 2 * b * h * n * n * d  # QK^T + PV

        variants = [
            ("row", lambda q, k, v: ka._flash_attention(q, k, v, scale)),
            ("transposed", lambda q, k, v: ka._flash_attention_t(q, k, v, scale)),
            ("xla", lambda q, k, v: ka._xla_attention(q, k, v, scale)),
        ]
        for name, fn in variants:
            try:
                dt = timeit(fn, q, k, v)
                print(f"[{b},{h},{n},{d}] {name:10s} {dt*1e3:8.3f} ms "
                      f"{flops/dt/1e12:6.2f} TFLOP/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[{b},{h},{n},{d}] {name:10s} FAILED: {e}", flush=True)

        if n != 4096:
            continue
        # backward comparison at the biggest shape: d/dq of sum(attn)
        def grad_step(lossfn):
            g = jax.grad(lambda q, k, v: jnp.sum(lossfn(q, k, v)),
                         argnums=0)
            return lambda q, k, v: g(q, k, v)

        for name, fn in [
            ("grad-flash", grad_step(
                lambda q, k, v: ka._flash_op(q, k, v, scale))),
            ("grad-xla", grad_step(
                lambda q, k, v: ka._xla_attention(q, k, v, scale))),
        ]:
            try:
                dt = timeit(fn, q, k, v)
                print(f"[{b},{h},{n},{d}] {name:10s} {dt*1e3:8.3f} ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[{b},{h},{n},{d}] {name:10s} FAILED: {e}", flush=True)


if __name__ == "__main__":
    main()
