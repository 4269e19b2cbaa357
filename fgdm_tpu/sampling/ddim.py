"""DDIM sampling as a jit-compiled ``lax.scan`` over timesteps.

Behavioural contract mirrors `/root/reference/ldm/models/diffusion/ddim.py`:
``make_schedule`` (`:26-55`) → `fgdm_tpu.core.schedules.DDIMSchedule`;
``ddim_sampling``'s python loop over ``np.flip(timesteps)`` (`:116-177`)
becomes one scan; ``p_sample_ddim`` (`:179-286`) is the step body —
classifier-free guidance ``e = e_uc + s·(e_c − e_uc)`` with the uncond and
cond branches **batched into a single model call** (the reference already
does ``cat([x]*2)``; here the whole loop is one traced program, so the UNet
weights stay resident and no host sync happens between steps).

Extras carried over: ``x_T`` injection, ``temperature``, img2img
``stochastic_encode``/``decode`` (`ddim.py:378-413`), per-step intermediates
as scan outputs (replacing the host-side log_every_t list), and the
composable-diffusion CFG variant (`ddim.py:204-212`).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule


def _scan_unroll() -> int:
    """Sampler-loop unroll factor (env-tunable A/B knob).

    The axon tunnel pays a per-loop-iteration sync (~1.3 ms measured);
    unrolling k steps per scan iteration amortizes it at the cost of a
    k×-longer step program (more compile time, same numerics)."""
    return int(os.environ.get("FGDM_SCAN_UNROLL", "1"))

# A denoise function: (x, t, cond) -> eps  where cond is an arbitrary pytree.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray, Any], jnp.ndarray]

# Tags for deriving independent per-slot noise streams from one slot key.
_SLOT_INIT_TAG = 0       # x_T draw
_SLOT_STEP_TAG = 1       # per-step sigma noise (eta > 0)
_SLOT_MASK_TAG = 2       # inpainting re-noise draws


def slot_noise(slot_rngs: jnp.ndarray, shape: Tuple[int, ...],
               tag: int, step: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-slot normal draw: slot ``b`` of the result depends ONLY on
    ``slot_rngs[b]`` (and ``tag``/``step``), never on the batch size or the
    slot's position.  This is what makes serving micro-batching bit-identical
    to solo execution at any slot assignment."""

    def draw(k):
        k = jax.random.fold_in(k, tag)
        if step is not None:
            k = jax.random.fold_in(k, step)
        return jax.random.normal(k, shape[1:], jnp.float32)

    return jax.vmap(draw)(slot_rngs)


def _bshape(v, x):
    return v.reshape((-1,) + (1,) * (x.ndim - 1))


def ddim_step(
    x: jnp.ndarray,
    e_t: jnp.ndarray,
    index: jnp.ndarray,
    sched: DDIMSchedule,
    noise: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM update given the model's eps prediction (ddim.py:248-273)."""
    a_t = sched.alphas[index]
    a_prev = sched.alphas_prev[index]
    sigma_t = sched.sigmas[index]
    sqrt_one_minus_at = sched.sqrt_one_minus_alphas[index]

    pred_x0 = (x - sqrt_one_minus_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * e_t
    if noise is None:
        noise_term = 0.0
    else:
        noise_term = sigma_t * noise * temperature
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise_term
    return x_prev, pred_x0


def cfg_eps(
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: Any,
    uncond: Any,
    scale: float,
) -> jnp.ndarray:
    """Classifier-free guidance with a single batched forward."""
    if uncond is None or (isinstance(scale, (int, float)) and scale == 1.0):
        return denoise_fn(x, t, cond)
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = jax.tree.map(
        lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond
    )
    e = denoise_fn(x_in, t_in, c_in)
    e_uc, e_c = jnp.split(e, 2, axis=0)
    return e_uc + scale * (e_c - e_uc)


def ddim_sample(
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: Tuple[int, ...],
    sched: DDIMSchedule,
    cond: Any,
    uncond: Any = None,
    cfg_scale: float = 7.5,
    x_T: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
    log_every_t: int = 0,
    callback: Optional[Callable] = None,
    mask: Optional[jnp.ndarray] = None,
    x0: Optional[jnp.ndarray] = None,
    schedule: Optional[DiffusionSchedule] = None,
    ucg_schedule: Optional[jnp.ndarray] = None,  # [S] per-step CFG scales
    guidance_fn: Optional[Callable] = None,  # (x,t,cond)->(eps,self,cross)
    slot_rngs: Optional[jnp.ndarray] = None,  # [B] per-slot keys
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full DDIM sampling loop.

    Returns ``(x_0_sample, intermediates)``.  ``intermediates['x_inter']``
    holds every ``log_every_t``-th x (scan outputs; empty when 0).
    ``mask``/``x0`` enable inpainting: known regions are re-noised from x0
    each step and composited (reference ddim.py:150-155: ``img = q_sample(
    x0,t)*mask + (1-mask)*img``; mask=1 marks *kept* regions).
    ``guidance_fn`` (a capture-mode apply_model) enables the inference-time
    attention-alignment inner loop (reference ``inference_loss=True``,
    ddim.py:190-191,228-231): the model input is nudged by
    ``x ← x − ∇ₓ(align_loss)`` before the eps prediction at scheduled steps.

    ``slot_rngs`` ([B] per-slot keys, e.g. ``vmap(PRNGKey)(seeds)``) switches
    every noise draw to a per-slot stream (:func:`slot_noise`): slot ``b``'s
    trajectory depends only on its own key, so results are invariant to
    batch composition — the contract serving micro-batching relies on.
    ``rng`` is ignored (may be None) when ``slot_rngs`` is given.
    """
    if mask is not None:
        assert x0 is not None and schedule is not None, \
            "inpainting needs x0 and the DDPM schedule"
    per_slot = slot_rngs is not None
    if per_slot:
        assert slot_rngs.shape[0] == shape[0], (slot_rngs.shape, shape)
        step_rngs = jnp.zeros((sched.num_steps,), jnp.uint32)  # unused
        if x_T is None:
            x = slot_noise(slot_rngs, shape, _SLOT_INIT_TAG)
        else:
            x = x_T
    else:
        rng, init_rng = jax.random.split(rng)
        x = (jax.random.normal(init_rng, shape, jnp.float32)
             if x_T is None else x_T)
        step_rngs = jax.random.split(rng, sched.num_steps)
    S = sched.num_steps
    eta_on = sched.eta != 0.0

    def body(x, per_step):
        i, step_rng = per_step
        index = S - 1 - i
        t = jnp.full((shape[0],), sched.timesteps[index], dtype=jnp.int32)
        if mask is not None:
            if per_slot:
                mask_noise = slot_noise(slot_rngs, shape, _SLOT_MASK_TAG, i)
            else:
                noise_rng, step_rng = jax.random.split(step_rng)
                mask_noise = jax.random.normal(noise_rng, shape, jnp.float32)
            img_orig = schedule.q_sample(x0, t, mask_noise)
            x = img_orig * mask + (1.0 - mask) * x
        # per-step guidance-scale schedule (cldm ddim_hacked ucg_schedule)
        scale = cfg_scale if ucg_schedule is None else ucg_schedule[i]
        if guidance_fn is not None:
            from fgdm_tpu.sampling.guidance import guided_cfg_eps

            e_t = guided_cfg_eps(guidance_fn, x, t, cond, uncond, scale, i)
        else:
            e_t = cfg_eps(denoise_fn, x, t, cond, uncond, scale)
        if not eta_on:
            noise = None
        elif per_slot:
            noise = slot_noise(slot_rngs, shape, _SLOT_STEP_TAG, i)
        else:
            noise = jax.random.normal(step_rng, shape, jnp.float32)
        x_prev, pred_x0 = ddim_step(x, e_t, index, sched, noise, temperature)
        out = ()
        if log_every_t:
            out = (x_prev, pred_x0)
        return x_prev, out

    xs = (jnp.arange(S), step_rngs)
    x, outs = jax.lax.scan(body, x, xs, unroll=_scan_unroll())
    intermediates = {}
    if log_every_t:
        intermediates["x_inter"] = outs[0][::log_every_t]
        # x̂₀ trajectory (reference intermediates['pred_x0'], ddim.py:222)
        intermediates["pred_x0"] = outs[1][::log_every_t]
    return x, intermediates


def stochastic_encode(
    schedule: DiffusionSchedule,
    sched: DDIMSchedule,
    x0: jnp.ndarray,
    t_index: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """img2img forward encode to DDIM step ``t_index`` (ddim.py:378-392)."""
    sqrt_alphas = jnp.sqrt(sched.alphas)
    sqrt_one_minus = sched.sqrt_one_minus_alphas
    return (
        _bshape(sqrt_alphas[t_index], x0) * x0
        + _bshape(sqrt_one_minus[t_index], x0) * noise
    )


def ddim_decode(
    denoise_fn: DenoiseFn,
    x_latent: jnp.ndarray,
    sched: DDIMSchedule,
    t_start: int,
    cond: Any,
    uncond: Any = None,
    cfg_scale: float = 1.0,
) -> jnp.ndarray:
    """Partial denoise from DDIM step ``t_start`` (img2img; ddim.py:395-413)."""
    b = x_latent.shape[0]

    def body(x, i):
        index = t_start - 1 - i
        t = jnp.full((b,), sched.timesteps[index], dtype=jnp.int32)
        e_t = cfg_eps(denoise_fn, x, t, cond, uncond, cfg_scale)
        x_prev, _ = ddim_step(x, e_t, index, sched)
        return x_prev, ()

    x, _ = jax.lax.scan(body, x_latent, jnp.arange(t_start))
    return x


def augmented_cfg_eps(
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: Any,
    aug_cond: Any,
    uncond: Any,
    scale: float,
) -> jnp.ndarray:
    """Augmented-conditioning guidance (ddim.py:213-220): 3-way batch
    [uncond, cond, aug]; e = uc + s((ac + s(c − ac)) − uc)."""
    x_in = jnp.concatenate([x, x, x], axis=0)
    t_in = jnp.concatenate([t, t, t], axis=0)
    c_in = jax.tree.map(
        lambda u, c, a: jnp.concatenate([u, c, a], axis=0),
        uncond, cond, aug_cond,
    )
    e = denoise_fn(x_in, t_in, c_in)
    e_uc, e_c, e_ac = jnp.split(e, 3, axis=0)
    e_t = e_ac + scale * (e_c - e_ac)
    return e_uc + scale * (e_t - e_uc)


def composable_cfg_eps(
    denoise_fn: DenoiseFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    conds: Any,        # stacked [P, ...] prompt conditionings
    uncond: Any,
    num_prompts: int,
) -> jnp.ndarray:
    """Composable-diffusion guidance: sum of per-prompt deltas
    (ddim.py:204-212).  ``x`` has batch 1; conds stacked on axis 0."""
    x_in = jnp.concatenate([x] * (num_prompts + 1), axis=0)
    t_in = jnp.concatenate([t] * (num_prompts + 1), axis=0)
    c_in = jax.tree.map(
        lambda u, c: jnp.concatenate([u, c], axis=0), uncond, conds
    )
    e = denoise_fn(x_in, t_in, c_in)
    e_uc, e_cs = e[:1], e[1:]
    return e_uc + jnp.sum(e_cs - e_uc, axis=0, keepdims=True)
