"""Attribute the VAE final-decode stage cost (in-program, not microbench).

tools/profile_chain.py measured the 64²→512² batch-4 decode at 300 ms
(~34 TF/s effective).  Standalone per-op microbenches disagree with
in-program behavior on this stack (NEXT.md item 7), so this tool times
the *actual* decode program under targeted ablations:

  full          — the shipped decoder (bf16 compute, fused GN)
  no_attn       — VaeAttnBlock stubbed to identity (isolates the
                  single-head 64² attention's in-program cost)
  no_fused_gn   — XLA GroupNorm instead of the Pallas fused GN+SiLU
  batch1        — batch-1 decode ×4 cost (batching efficiency)

Ablations change the math; numbers are for attribution only.
Prints one JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (persistent compile cache)
bench.enable_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fgdm_tpu.models import autoencoder as ae  # noqa: E402


def _force(out):
    float(jnp.asarray(out).reshape(-1)[0])


def timed(fn, make_args, iters=3):
    out = fn(*make_args(0))
    _force(out)
    times = []
    for i in range(iters):
        a = make_args(i + 1)
        t0 = time.perf_counter()
        out = fn(*a)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3


def build(fused_norm=True):
    vae = ae.AutoencoderKL(dtype=jnp.bfloat16, fused_norm=fused_norm)
    z = jnp.zeros((1, 64, 64, 4))
    shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
                         sample_posterior=False))
    # randomized params: zero-filled ones make XLA's constant folding
    # unrepresentative, and attention on all-equal scores is degenerate
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(1)
    params = treedef.unflatten([
        jax.random.normal(jax.random.fold_in(key, i), s.shape, s.dtype) * 0.05
        for i, s in enumerate(leaves)])
    return vae, params


def time_decode(vae, params, batch, salt):
    @jax.jit
    def dec(p, z):
        return vae.apply(p, z, method=ae.AutoencoderKL.decode)

    def make_args(i):
        z = jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(salt), i),
                              (batch, 64, 64, 4), jnp.float32)
        return (params, z)

    return timed(dec, make_args)


def main():
    salt = (os.getpid() * 1000003 + int(time.time())) % (1 << 20)
    vae, params = build()
    ms = time_decode(vae, params, 4, salt)
    print(json.dumps({"config": "full", "ms": round(ms, 2)}))
    sys.stdout.flush()

    orig = ae.VaeAttnBlock.__call__
    ae.VaeAttnBlock.__call__ = lambda self, x: x
    try:
        # params still bind: stubbed module simply has no params to apply
        vae2, params2 = build()
        ms = time_decode(vae2, params2, 4, salt + 1000)
        print(json.dumps({"config": "no_attn", "ms": round(ms, 2)}))
        sys.stdout.flush()
    finally:
        ae.VaeAttnBlock.__call__ = orig

    vae3, params3 = build(fused_norm=False)
    ms = time_decode(vae3, params3, 4, salt + 2000)
    print(json.dumps({"config": "no_fused_gn", "ms": round(ms, 2)}))
    sys.stdout.flush()

    ms = time_decode(vae, params, 1, salt + 3000)
    print(json.dumps({"config": "batch1", "ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
