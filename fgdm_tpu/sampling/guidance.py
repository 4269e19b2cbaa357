"""Training-free attention-alignment guidance inside the DDIM loop.

Re-design of `/root/reference/ldm/models/diffusion/ddim.py:288-376`
(``update_align_loss_self_cross``) and the loss kernels in
`ldm/models/diffusion/loss.py` (`align_loss_one_att:113-124`,
`caculate_align_loss_self_att:126-137`, `get_all_attention:154-187`,
`caculate_align_loss_att_fixed:272-292`).

The reference runs a **grad-through-UNet inner loop inside a no-grad
sampler**: at selected steps, iterate ``x ← x − ∇ₓ(align_loss)`` where the
loss aligns self- and cross-attention maps at 16² across batch chunks, with
a hardcoded per-step (loss_scale, max_iter) schedule (`ddim.py:291-305`).

Here it is a ``jax.grad`` of a loss over the UNet's natively-captured
per-head post-softmax maps (``capture="probs"`` — the ``*M`` classes'
output, `attention.py:341-342`), with the step-indexed schedule expressed
as masked ``lax.fori_loop`` iterations (static upper bound = the schedule's
max of 6) — one compiled program covers all steps, no recompilation per
bucket.  Loss kernels are parity-tested against the reference's torch
implementations (tests/test_guidance.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

MAX_ITERS = 6          # schedule maximum (ddim.py:295-296)
LOSS_THRESHOLD = 0.1   # ddim.py:309


def _schedule(index1: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_scale, max_iter) per sampling-step counter (ddim.py:291-305)."""
    scale = jnp.select(
        [index1 < 2, index1 < 5, index1 < 10, index1 < 20],
        [4.0, 4.0, 3.0, 3.0],
        1.0,
    )
    iters = jnp.select(
        [index1 < 2, index1 < 5, index1 < 10, index1 < 20],
        [2, 6, 3, 2],
        2,
    )
    return scale, iters


def _active(index1: jnp.ndarray) -> jnp.ndarray:
    """Steps where guidance runs: all of 0..9, then every 5th up to 35
    (ddim.py:318,349-351)."""
    return jnp.logical_or(
        index1 < 10,
        jnp.logical_and(index1 % 5 == 0, index1 <= 35),
    )


def _flat_maps(m: jnp.ndarray) -> jnp.ndarray:
    """[B,h,N,M] per-head capture → [B*h,N,M] (torch's '(b h) n m')."""
    if m.ndim == 4:
        return m.reshape(-1, m.shape[2], m.shape[3])
    return m


def _chunk_align_mse(maps: jnp.ndarray, num: int) -> jnp.ndarray:
    """Cyclic chunk-pair MSE: Σᵢ MSE(chunk_i, chunk_{(i+1)%num})
    (align_loss_one_att, loss.py:113-124).  Truncates dim0 to a multiple of
    ``num`` (torch.chunk would produce ragged chunks and the reference's
    indexing would fail there)."""
    n = (maps.shape[0] // num) * num
    chunks = jnp.stack(jnp.split(maps[:n], num, axis=0))
    rolled = jnp.roll(chunks, -1, axis=0)
    # Σ pair MSEs = num × mean over pairs
    return jnp.mean((chunks - rolled) ** 2) * num


def self_alignment_loss(
    selfattn: Dict[str, jnp.ndarray], num: int, res_tokens: int = 256
) -> jnp.ndarray:
    """caculate_align_loss_self_att (loss.py:126-137): raw captured maps at
    ``res_tokens``, chunk-pair MSE per map, mean over maps."""
    terms = []
    for m in selfattn.values():
        m = _flat_maps(m)
        if m.shape[1] == res_tokens:
            terms.append(_chunk_align_mse(m.astype(jnp.float32), num))
    if not terms:
        return jnp.zeros(())
    return sum(terms) / len(terms)


def cross_alignment_loss(
    crossattn: Dict[str, jnp.ndarray], num: int, res_tokens: int = 256
) -> jnp.ndarray:
    """caculate_align_loss_att_fixed (loss.py:272-292): average all maps at
    ``res_tokens`` over layers+batch+heads (get_all_attention), drop
    BOT/EOT tokens, ×100, softmax over tokens, chunk-pair MSE over the
    spatial rows, ÷ num."""
    mats = []
    for m in crossattn.values():
        m = _flat_maps(m)
        if m.shape[1] == res_tokens:
            mats.append(m.astype(jnp.float32))
    if not mats:
        return jnp.zeros(())
    agg = jnp.concatenate(mats, axis=0)
    agg = jnp.sum(agg, axis=0) / agg.shape[0]          # [N, M]
    t = agg[:, 1:-1] * 100.0
    t = jax.nn.softmax(t, axis=-1)
    return _chunk_align_mse(t, num) / num


def alignment_loss(
    selfattn: Dict[str, jnp.ndarray],
    crossattn: Dict[str, jnp.ndarray],
    num: int,
    loss_scale: jnp.ndarray,
    res_tokens: int = 256,
) -> jnp.ndarray:
    """loss = scale·self_align + scale·cross_align (ddim.py:323-333)."""
    loss1 = self_alignment_loss(selfattn, num, res_tokens)
    loss2 = cross_alignment_loss(crossattn, num, res_tokens)
    return loss_scale * (loss1 + loss2)


def guided_update(
    apply_model_capture: Callable,   # (x, t, cond) -> (eps, self, cross)
    x_in: jnp.ndarray,
    t_in: jnp.ndarray,
    cond: Any,
    index1: jnp.ndarray,             # sampling-step counter (traced)
    num: int = 2,
) -> jnp.ndarray:
    """One guidance pass: masked gradient-descent iterations on x_in.

    The loss threshold only gates the early branch (index1 < 10); the
    late-step branch iterates unconditionally up to max_iter
    (ddim.py:319,349-351)."""
    loss_scale, max_iter = _schedule(index1)
    active = _active(index1)

    def loss_fn(x):
        _, sa, ca = apply_model_capture(x, t_in, cond)
        return alignment_loss(sa, ca, num, loss_scale)

    grad_fn = jax.value_and_grad(loss_fn)

    def body(i, carry):
        x, prev_loss = carry
        above_threshold = jnp.logical_or(
            index1 >= 10, prev_loss > LOSS_THRESHOLD
        )
        run = jnp.logical_and(
            jnp.logical_and(active, i < max_iter), above_threshold
        )

        def step(x):
            loss, g = grad_fn(x)
            return x - g, loss

        def skip(x):
            return x, prev_loss

        x, loss = jax.lax.cond(run, step, skip, x)
        return x, loss

    x, _ = jax.lax.fori_loop(
        0, MAX_ITERS, body, (x_in, jnp.asarray(1e4, jnp.float32))
    )
    return x


def guided_cfg_eps(
    apply_model_capture: Callable,   # (x, t, cond) -> (eps, self, cross)
    x: jnp.ndarray,
    t: jnp.ndarray,
    cond: Any,
    uncond: Any,
    scale,
    index1: jnp.ndarray,
) -> jnp.ndarray:
    """CFG eps with the alignment-guidance inner loop applied to the doubled
    model input first (reference p_sample_ddim with inference_loss=True,
    ddim.py:228-231: x_in is nudged, the carried latent x is not)."""
    b = x.shape[0]
    if uncond is None:
        x_g = guided_update(apply_model_capture, x, t, cond, index1, num=b)
        e, _, _ = apply_model_capture(x_g, t, cond)
        return e
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    c_in = jax.tree.map(
        lambda u, c: jnp.concatenate([u, c], axis=0), uncond, cond
    )
    x_in = guided_update(apply_model_capture, x_in, t_in, c_in, index1,
                         num=b)
    e, _, _ = apply_model_capture(x_in, t_in, c_in)
    e_uc, e_c = jnp.split(e, 2, axis=0)
    return e_uc + scale * (e_c - e_uc)
