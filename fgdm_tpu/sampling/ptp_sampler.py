"""Prompt-to-prompt editing sampler: DDIM scan with compiled-in attention
editing (reference flow: `utils/ptp_utils.py` controllers driving a
diffusers-style loop; here one jitted lax.scan).

Batch layout: P prompts (base first); the same x_T seeds every prompt so
edits are directly comparable (ptp convention).  CFG runs fused (2P batch);
the editor touches only the conditional half.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.core.schedules import DDIMSchedule
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.sampling.ddim import ddim_step
from fgdm_tpu.utils.ptp import EditController, LocalBlend


def ptp_sample(
    ld: LatentDiffusion,
    controller: EditController,
    rng: jax.Array,
    cond_ctx: jnp.ndarray,       # [P,77,768] per-prompt embeddings
    uncond_ctx: jnp.ndarray,     # [P,77,768]
    latent_hw: Tuple[int, int] = (64, 64),
    num_steps: int = 50,
    cfg_scale: float = 7.5,
    eta: float = 0.0,
    local_blend: Optional[LocalBlend] = None,
    x_T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    sched = DDIMSchedule.create(ld.schedule, num_steps, eta=eta)
    P = cond_ctx.shape[0]
    shape = (P, latent_hw[0], latent_hw[1], ld.unet_def.in_channels)
    rng, init_rng = jax.random.split(rng)
    if x_T is None:
        base_noise = jax.random.normal(init_rng, (1,) + shape[1:], jnp.float32)
        x = jnp.broadcast_to(base_noise, shape)
    else:
        x = x_T

    ctx_in = jnp.concatenate([uncond_ctx, cond_ctx], axis=0)

    def body(x, i):
        index = sched.num_steps - 1 - i
        t = jnp.full((2 * P,), sched.timesteps[index], dtype=jnp.int32)
        controller.store = [] if local_blend is not None else None
        editor = controller.editor(i)
        x_in = jnp.concatenate([x, x], axis=0)
        eps = ld.unet_def.apply(
            ld.unet_params, x_in, t, context=ctx_in, attn_editor=editor,
        )
        e_uc, e_c = jnp.split(eps, 2, axis=0)
        e_t = e_uc + cfg_scale * (e_c - e_uc)
        x_prev, _ = ddim_step(x, e_t, index, sched)
        if local_blend is not None and controller.store:
            x_prev = local_blend(x_prev, controller.store)
        controller.store = None
        return x_prev, ()

    x, _ = jax.lax.scan(body, x, jnp.arange(sched.num_steps))
    return x
