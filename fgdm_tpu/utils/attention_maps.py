"""Attention-map aggregation for the distillation loss — in-graph.

JAX re-design of `/root/reference/utils/attention_utils.py:152-263`
(``get_token_maps``): the reference harvests maps via torch forward hooks and
``.detach().cpu()`` transfers (`ddpm.py:1739-1766`) — a host-sync throughput
sink.  Here the UNet returns maps natively (static ``capture`` flag) and the
aggregation stays on device inside the compiled train step.

Semantics preserved:
* self-attention: only layers whose map resolution == ``resn`` are used;
  each [B, r², r²] map is reshaped to expose the query grid, bicubic-resized
  to (resn, resn), flattened back, and layer-averaged.
* cross-attention: **all** layers are bicubic-resized to (resn, resn) over
  the query grid and layer-averaged → [B, resn, resn, 77].
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _resize_query_grid(m: jnp.ndarray, r: int, resn: int) -> jnp.ndarray:
    """[B, r², K] → bicubic resize of the query grid → [B, resn², K]."""
    if r == resn:
        # identity resize still materializes two full-size cubic-gather
        # intermediates (2×128MB per teacher map at r=64) — skip it
        return m
    b, _, k = m.shape
    m = m.reshape(b, r, r, k)
    m = jax.image.resize(m, (b, resn, resn, k), method="cubic")
    return m.reshape(b, resn * resn, k)


def get_token_maps(
    selfattn: Dict[str, jnp.ndarray],
    crossattn: Dict[str, jnp.ndarray],
    resn: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aggregate captured maps.

    Returns ``(self_maps [B, resn², resn²], cross_maps [B, resn, resn, 77])``.
    """
    # incremental sum (not jnp.stack+mean): a stack of k teacher maps is a
    # k×128MB copy that must be wholly live; the running sum lets XLA free
    # each map right after its add
    self_sum = None
    n_self = 0
    for m in selfattn.values():
        r = int(round(m.shape[1] ** 0.5))
        if r != resn:
            continue
        m = _resize_query_grid(m, r, resn)
        self_sum = m if self_sum is None else self_sum + m
        n_self += 1
    if self_sum is None:
        raise ValueError(f"no self-attention maps at resolution {resn}")
    self_maps = self_sum / n_self

    cross_sum = None
    n_cross = 0
    for m in crossattn.values():
        r = int(round(m.shape[1] ** 0.5))
        m = _resize_query_grid(m, r, resn).reshape(m.shape[0], resn, resn, -1)
        cross_sum = m if cross_sum is None else cross_sum + m
        n_cross += 1
    cross_maps = cross_sum / n_cross
    return self_maps, cross_maps


def avg_pool_map_2x(m: jnp.ndarray, times: int = 1) -> jnp.ndarray:
    """2^times× average-pool over the last two axes of [B, N, M] maps — the
    reference's ``downsample1`` trick for shrinking teacher self-maps
    (ddpm.py:130,1813).

    One ``reduce_window`` call, not reshape+mean: the reshape to
    [B, N/2, 2, M/2, 2] is not bitcastable under the TPU tiled layout, so
    it materialized a full copy of each 128MB raw teacher map."""
    w = 2 ** times
    s = jax.lax.reduce_window(
        m.astype(jnp.float32), 0.0, jax.lax.add,
        (1, w, w), (1, w, w), "VALID")
    return (s / (w * w)).astype(m.dtype)


def kl_distill_loss(
    teacher_self: jnp.ndarray,
    teacher_cross: jnp.ndarray,
    student_self: jnp.ndarray,
    student_cross: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """KL(teacher ‖ student) over softmaxed flattened maps, batchmean —
    reference ``compute_attn_distill_loss`` (ddpm.py:1785-1797)."""

    def kl(t, s):
        b = t.shape[0]
        t = t.reshape(b, -1) + eps
        s = s.reshape(b, -1) + eps
        log_q = jax.nn.log_softmax(s, axis=-1)
        p = jax.nn.softmax(t, axis=-1)
        log_p = jax.nn.log_softmax(t, axis=-1)
        return jnp.sum(p * (log_p - log_q)) / b

    return kl(teacher_self, student_self) + kl(teacher_cross, student_cross)
