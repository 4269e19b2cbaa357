"""Per-stage wall-time breakdown of the full FG-DM chain on one chip.

Times the four stage programs the staged server uses (serving.py stage
cuts: f1 50-step 256² DDIM, hint decode+resize, f2 20-step 512²
ControlNet DDIM, final VAE decode) plus the fused single-program chain,
at the bench configuration (batch 4, zero-filled full-size params).
The gap `fused − Σstages` is the fusion benefit across stage boundaries.

Prints one JSON line per stage: {"stage", "seconds", "share"}.

Usage: python tools/profile_chain.py   (TPU; ~3 min warm cache)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (configures the persistent compile cache)
bench.enable_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(out):
    """Completion barrier that actually works on the axon tunnel.

    `jax.block_until_ready` can return ~10 ms after dispatch for the
    first call following a warmup (measured: a 50-step DDIM "blocked" in
    0.014 s, then a scalar readback on the same output took 20 s while
    the queued work drained).  Reading one element back to the host is
    the only reliable barrier, mirroring bench_train.py's
    `float(metrics["loss"])` note.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        float(jnp.asarray(leaf).reshape(-1)[0])


def timed(make_args, fn, iters=3):
    """Time fn over `iters` executions with *distinct* args per iteration.

    Two tunnel artifacts defended against here: (1) repeated executions
    of an identical (executable, args) pair are served from a result
    cache that spans processes for a few minutes — hence per-process
    seed salting in main() and distinct keys per iteration; (2)
    block_until_ready is not a trustworthy barrier — hence _force's
    scalar readback after every call.  min-of-iters drops any iteration
    that absorbed previously queued work.
    """
    out = fn(*make_args(0))  # compile + warmup
    _force(out)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*make_args(i + 1))
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    from fgdm_tpu.sampling.chain import (
        condition_to_hint,
        factor_slot_keys,
        fgdm_chain,
        sample_condition_factor,
        sample_image_factor,
    )
    from fgdm_tpu.serving import slot_keys_from_seeds

    b = bench.BATCH
    ld, cldm = bench.build_pipeline()
    ctx = jnp.zeros((b, 77, 768), jnp.float32)
    salt = (os.getpid() * 1000003 + int(time.time())) % (1 << 20)

    def keys_at(i):
        lo = salt + i * b
        return slot_keys_from_seeds(range(lo, lo + b))

    f1 = jax.jit(lambda ld, k, p, e: sample_condition_factor(
        ld, None, p, e, latent_hw=(32, 32), num_steps=bench.F1_STEPS,
        cfg_scale=7.5, slot_rngs=factor_slot_keys(k, 1)))
    dec_hint = jax.jit(lambda ld, z: condition_to_hint(
        jnp.clip((ld.decode_first_stage(z) + 1.0) / 2.0, 0.0, 1.0),
        (512, 512)))
    f2 = jax.jit(lambda cldm, k, h, p, n: sample_image_factor(
        cldm, None, h, p, n, num_steps=bench.F2_STEPS, cfg_scale=9.0,
        slot_rngs=factor_slot_keys(k, 2)))
    dec2 = jax.jit(lambda cldm, z: cldm.decode_first_stage(z))

    stages = []
    t, z_cond = timed(lambda i: (ld, keys_at(i), ctx, ctx), f1)
    stages.append(("f1_sample_256", t))
    t, hint = timed(lambda i: (ld, z_cond + 1e-6 * i), dec_hint)
    stages.append(("hint_decode_resize", t))
    t, z_img = timed(lambda i: (cldm, keys_at(i), hint, ctx, ctx), f2)
    stages.append(("f2_sample_512", t))
    t, _ = timed(lambda i: (cldm, z_img + 1e-6 * i), dec2)
    stages.append(("final_decode", t))

    fused = jax.jit(lambda ld, cldm, k: fgdm_chain(
        ld, cldm, None, ctx, ctx, ctx, ctx, cond_hw=(256, 256),
        image_hw=(512, 512), f1_steps=bench.F1_STEPS,
        f2_steps=bench.F2_STEPS, slot_rngs=k)["image"])
    t_fused, _ = timed(lambda i: (ld, cldm, keys_at(i)), fused)

    total = sum(t for _, t in stages)
    for name, t in stages:
        print(json.dumps({"stage": name, "seconds": round(t, 4),
                          "share": round(t / total, 4)}))
    print(json.dumps({"stage": "sum_of_stages", "seconds": round(total, 4),
                      "img_per_sec": round(b / total, 4)}))
    print(json.dumps({"stage": "fused_chain", "seconds": round(t_fused, 4),
                      "img_per_sec": round(b / t_fused, 4)}))


if __name__ == "__main__":
    main()
