"""Cold-compile cost probe for the FG-DM chain (VERDICT r2 #1).

BENCH_r02 paid 1000.6 s of compile+first-run for the fused chain program.
This probe measures where that time goes and what the stage-split
alternative costs.  One mode per process (the remote compile service can
crash on multiple big compiles per process):

    python tools/compile_probe.py fused          # whole chain, one jit
    python tools/compile_probe.py fused-lowopt   # + exec_time_effort -1
    python tools/compile_probe.py f1             # factor-1 sampler jit
    python tools/compile_probe.py hint           # f1 VAE decode + resize
    python tools/compile_probe.py f2             # ControlNet stage + decode
    python tools/compile_probe.py staged-run     # all 3 stages, timed e2e

Interior-f2 isolation (r2 probes measured f1=30s hint=11s f2=869s — the
wall is inside f2):

    python tools/compile_probe.py f2sample       # 20-step sampler, no decode
    python tools/compile_probe.py f2decode       # VAE decode 64x64 -> 512x512
    python tools/compile_probe.py f2body         # ONE fused-CFG model forward

Any mode takes suffixes that flip kernels off before import:
``-noflash`` (XLA attention), ``-nogn`` (XLA GroupNorm).  e.g.
``f2sample-noflash``.

Each mode prints one JSON line.  Cache dir comes from FGDM_CACHE_DIR
(default /tmp/fgdm_cc_<mode>; point every stage at the SAME dir, then
staged-run measures the warm-start + steady-state throughput).
"""

import json
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "fused"
os.environ.setdefault("FGDM_CACHE_DIR", f"/tmp/fgdm_cc_{MODE}")
if "-noflash" in MODE:
    os.environ["FGDM_DISABLE_FLASH"] = "1"
if "-nogn" in MODE:
    os.environ["FGDM_BENCH_NO_FUSED_GN"] = "1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if "-lowopt" in MODE:
    jax.config.update("jax_exec_time_optimization_effort", -1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (configures the persistent cache dir)
bench.enable_cache()

BATCH = int(os.environ.get("FGDM_BENCH_BATCH", "4"))


def main():
    from fgdm_tpu.sampling.chain import (fgdm_chain, latent_to_condition_image,
                                         sample_condition_factor,
                                         sample_image_factor)

    ld, cldm = bench.build_pipeline()
    ctx = jnp.zeros((BATCH, 77, 768), jnp.float32)
    rng = jax.random.PRNGKey(0)
    base = MODE.split("-")[0]

    if base == "fused":
        @jax.jit
        def run(ld, cldm, rng):
            return fgdm_chain(ld, cldm, rng, ctx, ctx, ctx, ctx,
                              cond_hw=(256, 256), image_hw=(512, 512),
                              f1_steps=50, f2_steps=20)["image"]

        t0 = time.perf_counter()
        run(ld, cldm, rng).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "f1":
        @jax.jit
        def f1(ld, rng, ctx):
            return sample_condition_factor(ld, rng, ctx, ctx,
                                           latent_hw=(32, 32), num_steps=50)

        t0 = time.perf_counter()
        f1(ld, rng, ctx).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "hint":
        @jax.jit
        def hint(ld, z):
            return latent_to_condition_image(ld, z, (512, 512))

        z = jnp.zeros((BATCH, 32, 32, 4))
        t0 = time.perf_counter()
        hint(ld, z).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "f2":
        @jax.jit
        def f2(cldm, rng, h):
            z = sample_image_factor(cldm, rng, h, ctx, ctx,
                                    num_steps=20, cfg_scale=9.0)
            return cldm.decode_first_stage(z)

        h = jnp.zeros((BATCH, 512, 512, 3))
        t0 = time.perf_counter()
        f2(cldm, rng, h).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "f2sample":
        @jax.jit
        def f2s(cldm, rng, h):
            return sample_image_factor(cldm, rng, h, ctx, ctx,
                                       num_steps=20, cfg_scale=9.0)

        h = jnp.zeros((BATCH, 512, 512, 3))
        t0 = time.perf_counter()
        f2s(cldm, rng, h).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "f2decode":
        @jax.jit
        def dec(cldm, z):
            return cldm.decode_first_stage(z)

        z = jnp.zeros((BATCH, 64, 64, 4))
        t0 = time.perf_counter()
        dec(cldm, z).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "f2body":
        # ONE denoiser call at CFG batch (2B) — the scan body minus the scan.
        # denoise_fn is built INSIDE the jit from the traced cldm (closure
        # over a concrete pytree would bake params in as HLO constants).
        @jax.jit
        def body(cldm, x, t):
            h = jnp.zeros((2 * BATCH, 512, 512, 3))
            c2 = jnp.concatenate([ctx, ctx], 0)
            return cldm.denoise_fn()(
                x, t, {"c_crossattn": c2, "c_concat": h})

        x = jnp.zeros((2 * BATCH, 64, 64, 4))
        tt = jnp.zeros((2 * BATCH,), jnp.int32)
        t0 = time.perf_counter()
        body(cldm, x, tt).block_until_ready()
        out = {"mode": MODE, "compile_plus_first_s":
               round(time.perf_counter() - t0, 1)}

    elif base == "staged":  # staged-run
        @jax.jit
        def f1(ld, rng, ctx):
            return sample_condition_factor(ld, rng, ctx, ctx,
                                           latent_hw=(32, 32), num_steps=50)

        @jax.jit
        def hint(ld, z):
            return latent_to_condition_image(ld, z, (512, 512))

        @jax.jit
        def f2(cldm, rng, h):
            z = sample_image_factor(cldm, rng, h, ctx, ctx,
                                    num_steps=20, cfg_scale=9.0)
            return cldm.decode_first_stage(z)

        def chain(r):
            r1, r2 = jax.random.split(r)
            z = f1(ld, r1, ctx)
            h = hint(ld, z)
            return f2(cldm, r2, h)

        t0 = time.perf_counter()
        chain(rng).block_until_ready()
        warm = time.perf_counter() - t0
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            img = chain(jax.random.PRNGKey(i + 1))
        img.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        out = {"mode": MODE, "compile_plus_first_s": round(warm, 1),
               "img_per_s": round(BATCH / dt, 4)}
    else:
        raise SystemExit(f"unknown mode {MODE}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
