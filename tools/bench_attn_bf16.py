"""Probe: bf16 MXU operands in the transposed flash kernel.

On v5e an f32 matmul runs as multiple bf16 MXU passes; feeding bf16
operands (cast outside the kernel, fused into the q/k transposes) should
cut MXU time ~3x on the dots. Softmax stats stay f32; the p operand of the
PV dot is cast bf16 in-kernel (VPU cost — the thing to measure).
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import fgdm_tpu.kernels.attention as ka

ITERS = 50


def _kernel_bf16(qt_ref, kt_ref, v_ref, ot_ref, *, scale, block_k, kv_len):
    qt = qt_ref[0]  # bf16 [d, bq]
    d, block_q = qt.shape
    num_kb = kv_len // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        st = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m_i, jnp.max(st, axis=0, keepdims=True))
        p = jnp.exp(st - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=0, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            v, p.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros((d, block_q), jnp.float32)
    m_i = jnp.full((1, block_q), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((1, block_q), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc, m_i, l_i))
    ot_ref[0] = (acc / l_i).astype(ot_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_t_bf16(q, k, v, scale, block_q=512, block_k=1024):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    block_q, block_k = ka._pick_blocks(nq, nk, block_q, block_k)
    qt, kt, v3 = ka._t_layout(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                              v.astype(jnp.bfloat16), block_q, block_k)
    dp = qt.shape[1]
    nqp = qt.shape[2]
    out_t = pl.pallas_call(
        functools.partial(_kernel_bf16, scale=scale, block_k=block_k,
                          kv_len=nk),
        out_shape=jax.ShapeDtypeStruct((b * h, dp, nqp), q.dtype),
        grid=(b * h, nqp // block_q),
        in_specs=[
            pl.BlockSpec((1, dp, block_q), lambda g, i: (g, 0, i)),
            pl.BlockSpec((1, dp, nk), lambda g, i: (g, 0, 0)),
            pl.BlockSpec((1, nk, dp), lambda g, i: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, dp, block_q), lambda g, i: (g, 0, i)),
    )(qt, kt, v3)
    return out_t[:, :d, :nq].swapaxes(1, 2).reshape(b, h, nq, d)


def timeit(step, q, k, v):
    @jax.jit
    def chain(q, k, v):
        def body(_, acc):
            return step(acc, k, v)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, q))

    float(chain(q, k, v))
    t0 = time.perf_counter()
    float(chain(q, k, v))
    return (time.perf_counter() - t0) / ITERS


def main():
    rng = jax.random.PRNGKey(0)
    for (b, h, n, d) in [(8, 8, 4096, 40), (8, 8, 1024, 80)]:
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (b, h, n, d), jnp.float32)
        k = jax.random.normal(kk, (b, h, n, d), jnp.float32)
        v = jax.random.normal(kv, (b, h, n, d), jnp.float32)
        scale = 1 / math.sqrt(d)
        flops = 2 * 2 * b * h * n * n * d

        # correctness first
        ref = ka._xla_attention(q, k, v, scale)
        out = flash_t_bf16(q, k, v, scale)
        err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        print(f"[{b},{h},{n},{d}] bf16 rel err {err:.2e}")

        for name, fn in [
            ("t-f32", lambda q, k, v: ka._flash_attention_t(q, k, v, scale)),
            ("t-bf16", lambda q, k, v: flash_t_bf16(q, k, v, scale)),
        ]:
            dt = timeit(fn, q, k, v)
            print(f"[{b},{h},{n},{d}] {name:8s} {dt*1e3:8.3f} ms "
                  f"{flops/dt/1e12:6.2f} TFLOP/s", flush=True)

        # block sweep on the bf16 variant at the big shape
        if n == 4096:
            for bq, bk in [(256, 1024), (512, 512), (512, 2048),
                           (1024, 1024), (512, 4096), (1024, 512)]:
                fn = lambda q, k, v: flash_t_bf16(q, k, v, scale,
                                                  block_q=bq, block_k=bk)
                try:
                    dt = timeit(fn, q, k, v)
                    print(f"  bf16 bq={bq} bk={bk}: {dt*1e3:8.3f} ms "
                          f"{flops/dt/1e12:6.2f} TFLOP/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  bf16 bq={bq} bk={bk}: FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
