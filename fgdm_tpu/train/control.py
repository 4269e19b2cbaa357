"""ControlNet fine-tuning step (the seg→image factor's trainer).

Reference semantics (`/root/reference/controlnet/cldm/cldm.py:924-931`,
``ControlLDM.configure_optimizers``): AdamW over the control branch only;
with ``sd_locked=False`` the SD UNet's decoder (``output_blocks``) and
output head join the optimizer.  VAE/CLIP stay frozen always.

TPU redesign: one pjit step over the mesh ``data`` axis; the trainable
partition is a real split (frozen gradients are never materialized), and the
hint+text conditioning flows through ``ControlLDM.apply_model`` — the same
program the sampler compiles.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fgdm_tpu.diffusion.control import ControlLDM
from fgdm_tpu.diffusion.losses import diffusion_loss
from fgdm_tpu.train.state import TrainState, merge_params
from fgdm_tpu.train.train_step import optax_global_norm

__all__ = ["control_filter", "control_param_tree", "make_control_train_step"]


def control_filter(sd_locked: bool = True) -> Callable[[str], bool]:
    """Trainable rule over the combined {'control', 'unet'} tree
    (cldm.py:924-931)."""

    def f(path: str) -> bool:
        if path.startswith("control/"):
            return True
        if not sd_locked:
            # decoder + output head only; ResBlocks have internal
            # out_norm/out_conv sublayers, so anchor to the tree top
            return (path.startswith("unet/params/output_blocks_")
                    or path.startswith("unet/params/out_norm/")
                    or path.startswith("unet/params/out_conv/"))
        return False

    return f


def control_param_tree(cldm: ControlLDM) -> Dict:
    """The combined optimizer tree for a ControlLDM."""
    return {"control": cldm.control_params, "unet": cldm.unet_params}


def make_control_train_step(
    cldm: ControlLDM,
    parameterization: str = "eps",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    mesh: Optional[Mesh] = None,
):
    """Builds ``step(state, batch, rng) -> (state, metrics)``.

    ``state`` partitions :func:`control_param_tree` via
    :func:`control_filter`.  ``batch``: {'image': [B,H,W,3] target RGB in
    [-1,1] (or 'latent'), 'hint': [B,H,W,3] control image in [0,1],
    'input_ids': [B,77]} — the reference's ControlLDM.get_input contract
    (cldm.py:853-866: jpg target, hint in [0,1], txt caption).
    """

    def loss_fn(trainable, frozen, cldm_in, batch, rng):
        tree = merge_params(trainable, frozen)
        cldm_t = cldm_in.replace(control_params=tree["control"],
                                 unet_params=tree["unet"])
        rng_enc, rng_loss = jax.random.split(rng)
        if "latent" in batch:
            x_start = batch["latent"]
        else:
            x_start = cldm_t.encode_first_stage(batch["image"], rng_enc)
        ctx = cldm_t.get_learned_conditioning(batch["input_ids"])
        cond = {"c_crossattn": ctx, "c_concat": batch["hint"]}
        loss, loss_dict = diffusion_loss(
            cldm_t, rng_loss, x_start, cond,
            parameterization=parameterization,
            l_simple_weight=l_simple_weight,
            original_elbo_weight=original_elbo_weight,
        )
        return loss, loss_dict

    # cldm as a jit argument, not a closure: its frozen VAE/CLIP param
    # trees would embed as HLO constants (see make_train_step)
    def train_step_impl(cldm_in, state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, loss_dict), grads = grad_fn(state.params, state.frozen,
                                           cldm_in, batch, rng)
        new_state = state.apply_gradients(grads)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    if mesh is not None and mesh.size > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jitted = jax.jit(train_step_impl,
                         in_shardings=(repl, repl, data, repl),
                         out_shardings=(repl, repl), donate_argnums=(1,))
    else:
        jitted = jax.jit(train_step_impl, donate_argnums=(1,))

    def train_step(state, batch, rng):
        return jitted(cldm, state, batch, rng)

    return train_step
