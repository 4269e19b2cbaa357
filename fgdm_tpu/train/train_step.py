"""The pjit-compiled training step over the device mesh.

TPU-native replacement for the reference's Lightning ``training_step`` +
DDP (`/root/reference/ldm/models/diffusion/ddpm.py:426-440`,
`main.py:546,691-698`): the batch is sharded over the mesh ``data`` axis,
params/opt-state are replicated, and the gradient all-reduce is inserted by
XLA from the sharding annotations (psum over ICI — no NCCL plumbing).

Two jit specializations exist (plain / distill), mirroring the reference
where the distillation step changes shapes (ddpm.py:1188,1250-1254).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.diffusion.losses import diffusion_loss
from fgdm_tpu.train.condition import ConditionSynth
from fgdm_tpu.train.state import TrainState, merge_params


def _encode_target(ld_t, batch, condition, rng_enc):
    """Batch image → x_start latent, synthesizing the condition target
    in-graph when configured (reference get_input, ddpm.py:397-419)."""
    if "latent" in batch:
        return batch["latent"]
    img = batch["image"]
    if condition is None:
        return ld_t.encode_first_stage(img, rng_enc)
    tgt = condition.target(img)
    if condition.kind == "sketch_to_normal":
        # chunk (normal, sketch), encode each, concat latents — mirrors the
        # reference's 2-group split in LatentDiffusion.get_input
        # (ddpm.py:765-782).
        y, x = tgt[..., :3], tgt[..., 3:]
        r1, r2 = jax.random.split(rng_enc)
        zy = ld_t.encode_first_stage(y, r1)
        zx = ld_t.encode_first_stage(x, r2)
        return jnp.concatenate([zy, zx], axis=-1)
    return ld_t.encode_first_stage(tgt, rng_enc)


def make_train_step(
    ld: LatentDiffusion,
    distill: bool = False,
    parameterization: str = "eps",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    distill_weight: float = 0.1,
    encode_first_stage: bool = True,
    mesh: Optional[Mesh] = None,
    infer_state_sharding: bool = False,
    infer_ld_sharding: bool = False,
    condition: Optional[ConditionSynth] = None,
):
    """Builds ``train_step(state, batch, rng) -> (state, metrics)``.

    ``batch``: {'image': [B,H,W,3] in [-1,1] (or 'latent'), 'input_ids':
    [B,77] int32}.  When ``mesh`` is given, the returned function is jitted
    with batch sharded over 'data' and state replicated.  ``condition``
    runs a frozen annotator on ``batch['image']`` inside the compiled step
    to synthesize the factor's training target (depth/normal/sketch configs;
    reference ddpm.py:137-150,397-419).

    ``infer_state_sharding`` honors the state's existing placements (TP via
    ``parallel.tp.shard_params_tp``, FSDP via
    ``parallel.fsdp.shard_state_fsdp``); ``infer_ld_sharding`` does the same
    for the frozen VAE/CLIP pipeline so it too can be FSDP-stored.
    """

    def loss_fn(trainable, frozen, ld_in, batch, rng):
        unet_params = merge_params(trainable, frozen)
        ld_t = ld_in.replace(unet_params=unet_params)
        rng_enc, rng_loss = jax.random.split(rng)
        if encode_first_stage and "latent" not in batch:
            x_start = _encode_target(ld_t, batch, condition, rng_enc)
        else:
            x_start = batch["latent"]
        ctx = ld_t.get_learned_conditioning(batch["input_ids"])
        cond = {"c_crossattn": ctx}
        loss, loss_dict = diffusion_loss(
            ld_t, rng_loss, x_start, cond,
            parameterization=parameterization,
            l_simple_weight=l_simple_weight,
            original_elbo_weight=original_elbo_weight,
            distill=distill,
            distill_weight=distill_weight,
        )
        return loss, loss_dict

    # ld is a jit ARGUMENT, not a closure: closed-over VAE/CLIP param trees
    # embed as HLO constants — ~830MB of them at SD size, which blows the
    # axon remote-compile upload limit (HTTP 413) and bloats every cache
    # entry.  (bench.py applies the same rule for the sampling pipelines.)
    def train_step_impl(ld_in, state: TrainState,
                        batch: Dict[str, jnp.ndarray], rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, loss_dict), grads = grad_fn(state.params, state.frozen, ld_in,
                                           batch, rng)
        new_state = state.apply_gradients(grads)
        metrics = dict(loss_dict)
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    if mesh is not None and mesh.size > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # infer_state_sharding: honor the state's existing placements (e.g.
        # tensor-parallel params placed by parallel.tp.shard_params_tp);
        # XLA SPMD propagates the layouts and inserts the TP collectives.
        state_sharding = None if infer_state_sharding else repl
        ld_sharding = None if infer_ld_sharding else repl
        jitted = jax.jit(
            train_step_impl,
            in_shardings=(ld_sharding, state_sharding, data, repl),
            out_shardings=None if infer_state_sharding else (repl, repl),
            donate_argnums=(1,),
        )
    else:
        # single-device mesh: plain jit — SPMD annotations buy nothing
        jitted = jax.jit(train_step_impl, donate_argnums=(1,))

    def train_step(state, batch, rng):
        return jitted(ld, state, batch, rng)

    return train_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def make_eval_step(
    ld: LatentDiffusion,
    parameterization: str = "eps",
    mesh: Optional[Mesh] = None,
    condition: Optional[ConditionSynth] = None,
    infer_state_sharding: bool = False,
):
    """Validation loss (plain + EMA weights), reference validation_step
    (ddpm.py:442-450)."""

    # ld as a jit argument, not a closure — see make_train_step
    def eval_step_impl(ld_in, state: TrainState, batch, rng):
        metrics = {}
        for tag, unet_params in (
            ("", merge_params(state.params, state.frozen)),
            ("_ema", state.ema_full_params() if state.ema is not None else None),
        ):
            if unet_params is None:
                continue
            ld_t = ld_in.replace(unet_params=unet_params)
            rng_enc, rng_loss = jax.random.split(rng)
            if "latent" not in batch:
                x_start = _encode_target(ld_t, batch, condition, rng_enc)
            else:
                x_start = batch["latent"]
            ctx = ld_t.get_learned_conditioning(batch["input_ids"])
            _, loss_dict = diffusion_loss(
                ld_t, rng_loss, x_start, {"c_crossattn": ctx},
                parameterization=parameterization,
            )
            for k, v in loss_dict.items():
                metrics[f"val/{k}{tag}"] = v
        return metrics

    if mesh is not None and mesh.size > 1:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        jitted = jax.jit(
            eval_step_impl,
            in_shardings=(repl, None if infer_state_sharding else repl,
                          data, repl),
            out_shardings=repl)
    else:
        jitted = jax.jit(eval_step_impl)

    def eval_step(state, batch, rng):
        return jitted(ld, state, batch, rng)

    return eval_step
