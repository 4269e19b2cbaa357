"""3×3 conv A/B at the UNet hot shapes: XLA conv vs Pallas direct kernel.

Timing per the axon recipe: N iterations chained inside one jitted
fori_loop (output fed back as input), synced by a scalar readback —
per-op timings through the async tunnel are fiction.  Also reports the
~1 ms/iteration tunnel sync baseline measured with an empty body.

    python tools/bench_conv.py            # all hot shapes, both impls
    FGDM_DISABLE_PALLAS_CONV=1 ...        # XLA only

One JSON line per (shape, impl).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fgdm_tpu.kernels.conv import _conv3x3_fwd, _xla_conv3x3, conv3x3_ok  # noqa: E402
from fgdm_tpu.kernels.winograd import conv3x3_winograd, winograd_ok  # noqa: E402

ITERS = int(os.environ.get("FGDM_BENCH_ITERS", "30"))

# (B, H, C, Co): the fused-CFG f2 stage runs 2·batch4 = 8 at 64² latent;
# channel trios cover the three UNet levels + the widest skip-concat.
SHAPES = [
    (8, 64, 320, 320),
    (8, 32, 640, 640),
    (8, 16, 1280, 1280),
    (8, 8, 1280, 1280),
    (8, 32, 960, 640),
]


def bench(fn, x, w, b, iters=ITERS):
    def loop(x0):
        def body(_, xc):
            y = fn(xc, w, b)
            # feed output back (same shape when C == Co, else re-project:
            # tile/crop the channel axis so Co < C also broadcasts)
            if y.shape == xc.shape:
                return y
            c = xc.shape[-1]
            reps = -(-c // y.shape[-1])
            return xc + jnp.tile(y, (1, 1, 1, reps))[..., :c] * 1e-6
        return jax.lax.fori_loop(0, iters, body, x0)

    j = jax.jit(loop)
    j(x).block_until_ready()                      # compile + warm
    t0 = time.perf_counter()
    r = j(x)
    float(r[0, 0, 0, 0])                          # scalar readback sync
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    print(f"# device {dev.platform}", file=sys.stderr)
    for bsz, h, c, co in SHAPES:
        x = jnp.zeros((bsz, h, h, c), jnp.bfloat16)
        w = (jnp.ones((3, 3, c, co), jnp.bfloat16) * 0.01)
        b = jnp.zeros((co,), jnp.float32)
        flops = 2 * bsz * h * h * 9 * c * co
        row = {"shape": [bsz, h, h, c, co], "gflop": round(flops / 1e9, 2)}
        t_xla = bench(_xla_conv3x3, x, w, b)
        row["xla_ms"] = round(t_xla * 1e3, 3)
        row["xla_tflops"] = round(flops / t_xla / 1e12, 1)
        if conv3x3_ok(x.shape, w.shape, x.dtype):
            t_pl = bench(_conv3x3_fwd, x, w, b)
            row["pallas_ms"] = round(t_pl * 1e3, 3)
            row["pallas_tflops"] = round(flops / t_pl / 1e12, 1)
            row["speedup"] = round(t_xla / t_pl, 3)
        if winograd_ok(x.shape, w.shape):
            t_wg = bench(conv3x3_winograd, x, w, b)
            row["winograd_ms"] = round(t_wg * 1e3, 3)
            # effective TFLOP/s vs the DIRECT conv's flop count (what the
            # chain saves); Winograd's own multiply count is 16/36 of it
            row["winograd_eff_tflops"] = round(flops / t_wg / 1e12, 1)
            row["winograd_speedup"] = round(t_xla / t_wg, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
