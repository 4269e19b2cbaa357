"""Training-step throughput on one TPU chip (full-size FG-DM config).

Adapter-only fine-tuning step at 256² (reference seg config: bs 8,
`configs/stable-diffusion/..._distill_loss.yaml`): VAE encode + CLIP +
UNet fwd/bwd with AdamW on the adapter partition.  A/B the Pallas flash
backward with `FGDM_FLASH_BWD=0 python tools/bench_train.py`.

Prints images/sec/chip for the plain step and (optionally) the distill
step (`FGDM_BENCH_DISTILL=1`).
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp

# Per-process seed salt: the axon tunnel caches results per
# (program, args) pair across processes for a few minutes; replaying
# fixed seeds on a rerun returns cached outputs and inflates numbers.
_SALT = (os.getpid() * 1000003 + int(time.time())) % (1 << 20)


_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

BATCH = int(os.environ.get("FGDM_BENCH_BATCH", "8"))
DISTILL = os.environ.get("FGDM_BENCH_DISTILL", "0") == "1"


def main():
    from fgdm_tpu.core.schedules import DiffusionSchedule
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.train.state import TrainState, adapter_filter, make_adamw
    from fgdm_tpu.train.train_step import make_train_step

    dtype = jnp.bfloat16
    # reference training configs set use_checkpoint: True (→ remat); both
    # steps now fit HBM without it (reduced attention capture removed the
    # raw teacher maps that used to OOM the distill step) and run faster:
    # distill 70.2 → 77.5 img/s/chip remat-off (r3, batch 8 at 256²)
    remat = os.environ.get("FGDM_BENCH_REMAT", "0") == "1"
    unet = UNetModel(dtype=dtype, fused_norm_silu=True, remat=remat)
    vae = AutoencoderKL(dtype=dtype, fused_norm=True)
    clip = CLIPTextEncoder(dtype=dtype)
    sched = DiffusionSchedule.create(
        1000, "linear", linear_start=0.00085, linear_end=0.0120)

    rng = jax.random.PRNGKey(0)

    def absinit(mod, *args, **kw):
        shapes = jax.eval_shape(lambda: mod.init(rng, *args, **kw))
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    x1 = jnp.zeros((1, 32, 32, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    img = jnp.zeros((1, 256, 256, 3))

    ld = LatentDiffusion(
        unet_def=unet, vae_def=vae, clip_def=clip,
        unet_params=absinit(unet, x1, t, ctx),
        vae_params=absinit(vae, img, sample_posterior=False),
        clip_params=absinit(clip, jnp.zeros((1, 77), jnp.int32)),
        schedule=sched,
    )
    tx = make_adamw(1e-5)
    state = TrainState.create(ld.unet_params, tx,
                              trainable_filter=adapter_filter(),
                              use_ema=False)
    step = jax.jit(make_train_step(ld, distill=DISTILL), donate_argnums=0)

    batch = {
        "image": jnp.zeros((BATCH, 256, 256, 3), jnp.float32),
        "input_ids": jnp.zeros((BATCH, 77), jnp.int32),
    }
    t0 = time.perf_counter()
    state, metrics = step(state, batch, jax.random.PRNGKey(_SALT))
    jax.block_until_ready(metrics)
    sys.stderr.write(f"[bench_train] compile+first: "
                     f"{time.perf_counter()-t0:.1f}s "
                     f"loss={float(metrics['loss']):.4f}\n")
    try:
        ms = jax.local_devices()[0].memory_stats()
        sys.stderr.write(
            f"[bench_train] hbm peak {ms.get('peak_bytes_in_use', 0)/2**30:.2f}"
            f" GiB / {ms.get('bytes_limit', 0)/2**30:.2f} GiB\n")
    except Exception:
        pass

    iters = 10
    t0 = time.perf_counter()
    for i in range(2, 2 + iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(_SALT + i))
    # force completion: the tunnel is async, so read a scalar back
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    label = "distill" if DISTILL else "plain"
    bwd = "pallas" if os.environ.get("FGDM_FLASH_BWD", "1") == "1" else "xla"
    print(f'{{"metric": "fgdm_train_step_images_per_sec_per_chip_256px_'
          f'{label}", "value": {BATCH/dt:.4f}, "unit": "images/sec/chip", '
          f'"bwd": "{bwd}", "step_ms": {dt*1e3:.1f}}}')


if __name__ == "__main__":
    main()
