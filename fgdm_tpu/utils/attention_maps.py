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
    self_acc = []
    for m in selfattn.values():
        r = int(round(m.shape[1] ** 0.5))
        if r != resn:
            continue
        self_acc.append(_resize_query_grid(m, r, resn))
    if not self_acc:
        raise ValueError(f"no self-attention maps at resolution {resn}")
    self_maps = jnp.mean(jnp.stack(self_acc), axis=0)

    cross_acc = []
    for m in crossattn.values():
        r = int(round(m.shape[1] ** 0.5))
        cross_acc.append(
            _resize_query_grid(m, r, resn).reshape(m.shape[0], resn, resn, -1)
        )
    cross_maps = jnp.mean(jnp.stack(cross_acc), axis=0)
    return self_maps, cross_maps


def avg_pool_map_2x(m: jnp.ndarray, times: int = 1) -> jnp.ndarray:
    """2× average-pool over the last two axes of [B, N, M] maps — the
    reference's ``downsample1`` trick for shrinking teacher self-maps
    (ddpm.py:130,1813)."""
    for _ in range(times):
        b, n, k = m.shape
        m = m.reshape(b, n // 2, 2, k // 2, 2).mean(axis=(2, 4))
    return m


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
