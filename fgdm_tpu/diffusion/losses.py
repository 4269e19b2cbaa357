"""Training objectives: eps-MSE + ELBO weighting + attention distillation.

Mirrors `/root/reference/ldm/models/diffusion/ddpm.py:1186-1258`
(``p_losses``): weighted simple loss (l2 on eps or x0), VLB term with
``lvlb_weights``, plus — on distillation steps — ``0.1 × KL(teacher ‖
student)`` over aggregated attention maps where the teacher is the *same*
UNet run with the adapter disabled on a 2×-upsampled latent
(`ddpm.py:1250-1254,1799-1818`).  No second model copy, no hooks, no host
transfers: both forwards and the KL stay inside one compiled step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.utils.attention_maps import (
    get_token_maps,
    kl_distill_loss,
)


def nearest_upsample_2x_latent(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


def _pool_cross_2x(m: jnp.ndarray) -> jnp.ndarray:
    """[B, r, r, K] → [B, r/2, r/2, K] average pool (downsample2,
    ddpm.py:131,1814)."""
    b, r, _, k = m.shape
    return m.reshape(b, r // 2, 2, r // 2, 2, k).mean(axis=(2, 4))


def teacher_attention_maps(
    ld: LatentDiffusion,
    x_start: jnp.ndarray,
    noise: jnp.ndarray,
    t: jnp.ndarray,
    cond: Dict[str, Any],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Frozen-SD teacher maps: forward on the 2×-upsampled noisy latent with
    the adapter disabled, maps aggregated at 2·resn then pooled back to resn
    (reference ``get_attnmaps``, ddpm.py:1799-1818).

    Gradients are stopped at the teacher's *inputs* (params included), not
    just its outputs: with only an output-side stop_gradient the VJP tracer
    still records residuals for the whole teacher subgraph (it shares param
    tensors with the student), and those ~8 GB of saved activations/maps
    survived to the compiled program — the distill step OOMed v5e HBM at
    batch 8 until this (measured: temp 9.1 → 1.1 GiB without the teacher).
    """
    sg = jax.lax.stop_gradient
    ld = jax.tree.map(sg, ld)
    x_start, noise, t = sg(x_start), sg(noise), sg(t)
    cond = jax.tree.map(sg, cond)
    resn = x_start.shape[1]
    x2 = ld.schedule.q_sample(
        nearest_upsample_2x_latent(x_start),
        t,
        nearest_upsample_2x_latent(noise),
    )
    # Reduced capture: only the 2·resn self layers emit maps, already
    # pooled 4× on both token axes inside the capture einsum (pooling a
    # bilinear form commutes onto q/k — see attention_with_scores).  The
    # raw [B, (2r)², (2r)²] teacher maps (5×67 MB/sample at 256² training)
    # never exist; this step used to pool each one after materializing it.
    from fgdm_tpu.nn.attention import CaptureSpec
    from fgdm_tpu.utils.attention_maps import _resize_query_grid

    r2 = 2 * resn
    _, t_self_raw, t_cross_raw = ld.apply_model(
        x2, t, cond, adapter_on=False,
        capture=CaptureSpec(self_n=r2 * r2, self_pool=4),
    )
    self_sum = None
    n_self = 0
    for m in t_self_raw.values():               # already [B, resn², resn²]
        self_sum = m if self_sum is None else self_sum + m
        n_self += 1
    if self_sum is None:
        raise ValueError(f"no teacher self-attention maps at {r2}")
    t_self = self_sum / n_self

    cross_sum = None
    n_cross = 0
    for m in t_cross_raw.values():
        r = int(round(m.shape[1] ** 0.5))
        m = _resize_query_grid(m, r, r2).reshape(m.shape[0], r2, r2, -1)
        m = _pool_cross_2x(m)                   # [B, resn, resn, 77]
        cross_sum = m if cross_sum is None else cross_sum + m
        n_cross += 1
    t_cross = cross_sum / n_cross
    return t_self, t_cross


def diffusion_loss(
    ld: LatentDiffusion,
    rng: jax.Array,
    x_start: jnp.ndarray,
    cond: Dict[str, Any],
    parameterization: str = "eps",
    l_simple_weight: float = 1.0,
    original_elbo_weight: float = 0.0,
    distill: bool = False,
    distill_weight: float = 0.1,
    trunc_bs: Optional[int] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One loss evaluation. ``distill=True`` is a second jit specialization
    (the reference's distill step also changes shapes, ddpm.py:1188)."""
    b = x_start.shape[0]
    rng_t, rng_noise = jax.random.split(rng)
    t = jax.random.randint(rng_t, (b,), 0, ld.schedule.num_timesteps)
    noise = jax.random.normal(rng_noise, x_start.shape, jnp.float32)
    x_noisy = ld.schedule.q_sample(x_start, t, noise)

    if parameterization == "eps":
        target = noise
    elif parameterization == "x0":
        target = x_start
    elif parameterization == "v":
        # v-prediction (controlnet/ldm ddpm.py:82,290): v = a·eps − s·x0
        target = ld.schedule.get_v(x_start, noise, t)
    else:
        raise NotImplementedError(parameterization)

    loss_dict: Dict[str, jnp.ndarray] = {}

    if distill:
        # Capture attention maps only for the truncated distill batch
        # (trucbs, ddpm.py:1188): the batch is split into a capture forward
        # on the first tb rows and a plain forward on the rest, then
        # re-concatenated — identical outputs/gradients to capturing the
        # full batch and truncating after, but the VJP holds [tb,N,N] maps
        # instead of [B,N,N] (full-size distill OOMed HBM at batch 8).
        tb_cap = trunc_bs or min(max(2, b // 10), 8)
        tb_cap = min(tb_cap, b)
        cond_tb_ = jax.tree.map(lambda c: c[:tb_cap], cond)
        from fgdm_tpu.nn.attention import CaptureSpec

        resn_cap = x_start.shape[1]
        out_tb, selfattn, crossattn = ld.apply_model(
            x_noisy[:tb_cap], t[:tb_cap], cond_tb_,
            # only the resn-token self layers feed the loss; skip the
            # score einsums (and their VJP residuals) everywhere else
            capture=CaptureSpec(self_n=resn_cap * resn_cap),
        )
        if tb_cap < b:
            cond_rest = jax.tree.map(lambda c: c[tb_cap:], cond)
            out_rest = ld.apply_model(
                x_noisy[tb_cap:], t[tb_cap:], cond_rest)
            model_output = jnp.concatenate([out_tb, out_rest], axis=0)
        else:
            model_output = out_tb
    else:
        model_output = ld.apply_model(x_noisy, t, cond)

    sq = (model_output.astype(jnp.float32) - target) ** 2
    loss_simple = jnp.mean(sq, axis=(1, 2, 3))
    loss_dict["loss_simple"] = jnp.mean(loss_simple)

    loss = l_simple_weight * jnp.mean(loss_simple)

    loss_vlb = jnp.mean(ld.schedule.lvlb_weights[t] * loss_simple)
    loss_dict["loss_vlb"] = loss_vlb
    loss = loss + original_elbo_weight * loss_vlb

    if distill:
        # reference trucbs = min(max(2, B//10), 8)  (ddpm.py:1188);
        # the capture forward above already ran on exactly these rows
        tb = tb_cap
        resn = x_start.shape[1]
        s_self, s_cross = get_token_maps(selfattn, crossattn, resn=resn)

        cond_tb = jax.tree.map(lambda c: c[:tb], cond)
        t_self, t_cross = teacher_attention_maps(
            ld, x_start[:tb], noise[:tb], t[:tb], cond_tb
        )
        dl = kl_distill_loss(t_self, t_cross, s_self, s_cross)
        loss_dict["loss_distill"] = dl
        loss = loss + distill_weight * dl

    loss_dict["loss"] = loss
    return loss, loss_dict
