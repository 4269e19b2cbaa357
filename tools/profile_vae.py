"""Per-shape profile of the VAE decoder's hot ops on one TPU chip.

The chain profiler (tools/profile_chain.py) shows the two VAE decodes at
~34 TF/s effective vs ~108 TF/s for the UNet sampling stages.  This tool
attributes that: it times each distinct decoder conv shape (bench config:
batch 4, bf16 compute, f32 params cast at use) and the 64² single-head
mid attention, so kernel work targets shapes that are actually slow.

Methodology: each timing body chains ``CHAIN_LEN`` sequential convs with
*distinct* weights (output of one feeds the next), defeating both the
tunnel's (program, args) result cache and the loop-pipelining artifact
that inflated earlier fori_loop microbenches (NEXT.md item 7).  A scalar
readback after every call is the completion barrier — block_until_ready
returns early on the tunnel (see tools/profile_chain.py:_force).

Prints one JSON line per shape: {"op", "h", "cin", "cout", "ms_per_op",
"tflops_per_sec"}.

Usage: python tools/profile_vae.py   (TPU; a few min of small compiles)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures the persistent compile cache)
bench.enable_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH = 4
CHAIN_LEN = 8
# (h, cin, cout): every distinct 3x3 conv shape in the 64²→512² decode
# (models/autoencoder.py:Decoder with ch=128, ch_mult=(1,2,4,4)).
CONV_SHAPES = [
    (64, 512, 512),
    (128, 512, 512),
    (256, 512, 512),
    (256, 512, 256),
    (256, 256, 256),
    (512, 256, 256),
    (512, 256, 128),
    (512, 128, 128),
]


def _force(out):
    float(jnp.asarray(out).reshape(-1)[0])


def timed_ms(fn, args, iters=3):
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3, out


def conv_chain(h, cin, cout):
    """cin→cout conv then CHAIN_LEN-1 cout→cout convs, distinct weights."""
    key = jax.random.PRNGKey(hash((h, cin, cout)) % (1 << 30))
    ks = [jax.random.normal(jax.random.fold_in(key, 0),
                            (3, 3, cin, cout), jnp.float32) * 0.05]
    for i in range(1, CHAIN_LEN):
        ks.append(jax.random.normal(jax.random.fold_in(key, i),
                                    (3, 3, cout, cout), jnp.float32) * 0.05)

    @jax.jit
    def run(x, ks):
        for k in ks:
            x = jax.lax.conv_general_dilated(
                x, k.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.float32(x).mean()

    x = jax.random.normal(jax.random.fold_in(key, 99),
                          (BATCH, h, h, cin), jnp.bfloat16) * 0.1
    ms, _ = timed_ms(run, (x, ks))
    flops = BATCH * h * h * 9 * 2 * (cin * cout + (CHAIN_LEN - 1) * cout * cout)
    return ms / CHAIN_LEN, flops / CHAIN_LEN


def attn_64(ch=512):
    """The decoder's single-head 64² mid attention, as VaeAttnBlock runs it
    (full [B, N, N] f32 score materialization, models/autoencoder.py:65)."""
    key = jax.random.PRNGKey(7)
    n = 64 * 64

    @jax.jit
    def run(q, k, v):
        s = jnp.einsum("bic,bjc->bij", q, k).astype(jnp.float32) * ch ** -0.5
        a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        return jnp.float32(jnp.einsum("bij,bjc->bic", a, v)).mean()

    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (BATCH, n, ch), jnp.bfloat16) * 0.1
               for i in range(3))
    ms, _ = timed_ms(run, (q, k, v))
    flops = BATCH * 2 * n * n * ch * 2
    return ms, flops


def main():
    for h, cin, cout in CONV_SHAPES:
        ms, flops = conv_chain(h, cin, cout)
        print(json.dumps({"op": "conv3x3", "h": h, "cin": cin, "cout": cout,
                          "ms_per_op": round(ms, 3),
                          "tflops_per_sec": round(flops / ms / 1e9, 1)}))
        sys.stdout.flush()
    ms, flops = attn_64()
    print(json.dumps({"op": "mid_attn_full", "h": 64, "cin": 512, "cout": 512,
                      "ms_per_op": round(ms, 3),
                      "tflops_per_sec": round(flops / ms / 1e9, 1)}))


if __name__ == "__main__":
    main()
