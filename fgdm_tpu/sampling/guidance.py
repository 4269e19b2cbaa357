"""Training-free attention-alignment guidance inside the DDIM loop.

Re-design of `/root/reference/ldm/models/diffusion/ddim.py:288-376`
(``update_align_loss_self_cross``) and the loss kernels in
`ldm/models/diffusion/loss.py` (`align_loss_one_att:177-188`,
`caculate_align_loss_self_att:190-203`, chunk-pairing MSE).

The reference runs a **grad-through-UNet inner loop inside a no-grad
sampler**: at selected steps, iterate ``x ← x − ∇ₓ(align_loss)`` where the
loss aligns self- and cross-attention maps at 16² across batch chunks, with
a hardcoded per-step (loss_scale, max_iter) schedule (`ddim.py:291-305`).

Here it is a ``jax.grad`` of a loss over the UNet's natively-captured maps,
with the step-indexed schedule expressed as masked ``lax.fori_loop``
iterations (static upper bound = the schedule's max of 6) — one compiled
program covers all steps, no recompilation per bucket.
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


def _chunk_align_mse(maps: jnp.ndarray, num: int) -> jnp.ndarray:
    """MSE between cyclically-paired batch chunks (align_loss_one_att)."""
    chunks = jnp.stack(jnp.split(maps, num, axis=0))
    rolled = jnp.roll(chunks, -1, axis=0)
    return jnp.mean((chunks - rolled) ** 2) * num


def alignment_loss(
    selfattn: Dict[str, jnp.ndarray],
    crossattn: Dict[str, jnp.ndarray],
    num: int,
    loss_scale: jnp.ndarray,
    res_tokens: int = 256,
) -> jnp.ndarray:
    """Self-map chunk alignment at 16² + sharpened cross-map alignment."""
    self_terms = []
    for m in selfattn.values():
        if m.shape[1] == res_tokens:
            probs = jax.nn.softmax(m.astype(jnp.float32), axis=-1)
            self_terms.append(_chunk_align_mse(probs, num))
    loss1 = (
        sum(self_terms) / max(len(self_terms), 1)
        if self_terms else jnp.zeros(())
    )

    cross_terms = []
    for m in crossattn.values():
        if m.shape[1] == res_tokens:
            # text-token sharpening as in caculate_loss_att_fixed_cnt:
            # drop BOT/EOT, ×100, softmax over tokens
            t = m.astype(jnp.float32)[:, :, 1:-1] * 100.0
            t = jax.nn.softmax(t, axis=-1)
            cross_terms.append(_chunk_align_mse(t, num))
    loss2 = (
        sum(cross_terms) / max(len(cross_terms), 1)
        if cross_terms else jnp.zeros(())
    )
    return loss_scale * (loss1 + loss2)


def guided_update(
    apply_model_capture: Callable,   # (x, t, cond) -> (eps, self, cross)
    x_in: jnp.ndarray,
    t_in: jnp.ndarray,
    cond: Any,
    index1: jnp.ndarray,             # sampling-step counter (traced)
    num: int = 2,
) -> jnp.ndarray:
    """One guidance pass: masked gradient-descent iterations on x_in."""
    loss_scale, max_iter = _schedule(index1)
    active = _active(index1)

    def loss_fn(x):
        _, sa, ca = apply_model_capture(x, t_in, cond)
        return alignment_loss(sa, ca, num, loss_scale)

    grad_fn = jax.value_and_grad(loss_fn)

    def body(i, carry):
        x, prev_loss = carry
        run = jnp.logical_and(
            jnp.logical_and(active, i < max_iter),
            prev_loss > LOSS_THRESHOLD,
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
