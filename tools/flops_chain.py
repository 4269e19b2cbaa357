"""Derive the FG-DM chain's FLOPs/image from XLA cost analysis.

Grounds BASELINE.md's A100 estimate and the compute-bound ceiling used by
bench.py's ``vs_baseline``: compiles each chain component (CPU, no
execution) and reads XLA's flop count, then converts peak-TFLOPs × MFU
assumptions into images/sec bounds.

Run: JAX_PLATFORMS=cpu python tools/flops_chain.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from fgdm_tpu.checkpoint.loader import sd_clip, sd_controlnet, sd_unet, sd_vae

BATCH = 1  # per-image cost; CFG doubles the model batch


def flops_of(fn, *args) -> float:
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c["flops"])


def main():
    unet = sd_unet(dtype=jnp.bfloat16)
    cn = sd_controlnet(dtype=jnp.bfloat16)
    vae = sd_vae(dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    t = jnp.zeros((2 * BATCH,), jnp.int32)
    ctx = jnp.zeros((2 * BATCH, 77, 768), jnp.bfloat16)

    # factor 1: UNet+adapter at 32² latent (256² image), CFG-doubled batch
    x1 = jnp.zeros((2 * BATCH, 32, 32, 4), jnp.bfloat16)
    p_unet = jax.eval_shape(lambda: unet.init(rng, x1, t, ctx))
    p_unet = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p_unet)
    f1 = flops_of(lambda p, x: unet.apply(p, x, t, ctx), p_unet, x1)

    # factor 2: UNet at 64² + ControlNet branch, CFG-doubled batch
    x2 = jnp.zeros((2 * BATCH, 64, 64, 4), jnp.bfloat16)
    p_unet2 = jax.eval_shape(lambda: unet.init(rng, x2, t, ctx))
    p_unet2 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p_unet2)
    f2_unet = flops_of(lambda p, x: unet.apply(p, x, t, ctx), p_unet2, x2)
    hint = jnp.zeros((2 * BATCH, 512, 512, 3), jnp.bfloat16)
    p_cn = jax.eval_shape(lambda: cn.init(rng, x2, hint, t, ctx))
    p_cn = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p_cn)
    f2_cn = flops_of(lambda p, x, h: cn.apply(p, x, h, t, ctx), p_cn, x2,
                     hint)

    # VAE decodes (batch 1 each): 32²→256² and 64²→512²
    z1 = jnp.zeros((BATCH, 32, 32, 4), jnp.bfloat16)
    z2 = jnp.zeros((BATCH, 64, 64, 4), jnp.bfloat16)
    p_vae = jax.eval_shape(lambda: vae.init(
        rng, jnp.zeros((1, 256, 256, 3)), sample_posterior=False))
    p_vae = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p_vae)
    from fgdm_tpu.models.autoencoder import AutoencoderKL

    dec1 = flops_of(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode),
                    p_vae, z1)
    dec2 = flops_of(lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode),
                    p_vae, z2)

    F1_STEPS, F2_STEPS = 50, 20
    chain = F1_STEPS * f1 + F2_STEPS * (f2_unet + f2_cn) + dec1 + dec2
    tf = 1e12
    print(f"UNet eval @32² (CFG batch 2):        {f1 / tf:8.3f} TFLOPs")
    print(f"UNet eval @64² (CFG batch 2):        {f2_unet / tf:8.3f} TFLOPs")
    print(f"ControlNet eval @64² (CFG batch 2):  {f2_cn / tf:8.3f} TFLOPs")
    print(f"VAE decode 32²→256²:                 {dec1 / tf:8.3f} TFLOPs")
    print(f"VAE decode 64²→512²:                 {dec2 / tf:8.3f} TFLOPs")
    print(f"CHAIN total (50+20 steps + decodes): {chain / tf:8.3f} TFLOPs"
          f"/image")
    for name, peak in (("A100 bf16 (312 TF/s)", 312e12),
                       ("v5e bf16 (197 TF/s)", 197e12)):
        for mfu in (0.2, 0.35, 0.5):
            print(f"  {name} @ {int(mfu * 100)}% MFU → "
                  f"{peak * mfu / chain:6.2f} img/s compute-bound")


if __name__ == "__main__":
    main()
