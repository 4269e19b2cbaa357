"""Joint two-factor (AdaptDiffusion-style) training step.

Reference semantics (`/root/reference/ldm/models/diffusion/ddpm.py:
1851-1927`, ``AdaptDiffusion.p_losses`` + ``configure_optimizers``):

* the batch latent is a channel-stacked pair of factors; the loss noises the
  **image** half with ``q_sample`` and regresses its eps (the condition half
  enters only as conditioning, `:1888-1893,1904-1906`);
* with ``freeze_backbone``, only the joint image adapter's parameters are
  optimized (`:1866-1870`) — here
  :func:`fgdm_tpu.train.state.joint_image_adapter_filter`.

TPU redesign: one jitted step over the mesh ``data`` axis; the frozen
partition never materializes gradients; the clean condition latent feeds the
image UNet through the ``cond_map`` bypass of :class:`SeqTwoUNet`
(`controlnet/cldm/cldm.py:285-291`), so no second UNet forward runs during
adapter training.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.models.seq_two_unet import SeqTwoUNet
from fgdm_tpu.train.state import TrainState, merge_params
from fgdm_tpu.train.train_step import optax_global_norm

__all__ = ["make_joint_train_step"]


def make_joint_train_step(
    model: SeqTwoUNet,
    schedule: DiffusionSchedule,
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    mesh: Optional[Mesh] = None,
):
    """Builds ``step(state, batch, rng) -> (state, metrics)``.

    ``batch``: {'latent': [B,H,W,2*factor_channels] joint factor latents
    (image half first, condition half second — SeqTwoUNet layout),
    'context': [B,77,ctx] text conditioning}.
    """
    fc = model.factor_channels

    def loss_fn(trainable, frozen, batch, rng):
        params = merge_params(trainable, frozen)
        lat = batch["latent"]
        x_img = lat[..., :fc]
        x_cond = lat[..., fc:]
        rng_t, rng_n = jax.random.split(rng)
        b = x_img.shape[0]
        t = jax.random.randint(rng_t, (b,), 0, schedule.num_timesteps)
        noise = jax.random.normal(rng_n, x_img.shape, jnp.float32)
        x_noisy = schedule.q_sample(x_img.astype(jnp.float32), t, noise)
        # condition factor supplied clean via the cond_map bypass — unet2
        # is skipped, its eps slot is zero (cldm.py:285-291)
        x_in = jnp.concatenate(
            [x_noisy.astype(lat.dtype), x_cond], axis=-1)
        out = model.apply(
            params, x_in, t, context=batch.get("context"),
            cond_map=x_cond,
        )
        eps1 = out[..., :fc].astype(jnp.float32)
        loss_simple = jnp.mean(
            jnp.square(eps1 - noise), axis=(1, 2, 3))
        loss = l_simple_weight * jnp.mean(loss_simple)
        metrics = {"train/loss_simple": jnp.mean(loss_simple)}
        if original_elbo_weight > 0.0:
            lvlb_w = schedule.lvlb_weights[t]
            loss_vlb = jnp.mean(lvlb_w * loss_simple)
            metrics["train/loss_vlb"] = loss_vlb
            loss = loss + original_elbo_weight * loss_vlb
        metrics["train/loss"] = loss
        return loss, metrics

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, state.frozen, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        step = jax.jit(
            step,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    else:
        step = jax.jit(step, donate_argnums=(0,))
    return step
