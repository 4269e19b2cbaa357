"""Ring attention: context parallelism over the mesh sequence axis.

The reference's only tools for big sequences are memory workarounds (sliced
attention, fold/unfold — SURVEY §5 long-context note).  This is the
TPU-native replacement for >1024² generation: the token axis is sharded
across the mesh, each device holds a query shard, and K/V shards rotate
around the ring with ``jax.lax.ppermute`` while an online-softmax
accumulator builds the exact full-attention result — compute overlaps the
ICI transfer, HBM never holds the N×N score matrix, and max sequence scales
linearly with the ring size.

Expressed with ``shard_map`` + XLA collectives (the pallas-RDMA variant in
`/opt` guide's ring pattern is a further optimization); exact vs single-
device attention, tested on the virtual 8-device mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _ring_body(q, k, v, scale, axis_name):
    """Per-device: q local [B,H,n,D]; k/v rotate; exact online softmax."""
    p = jax.lax.psum(1, axis_name)  # ring size

    def step(carry, _):
        acc, m_i, l_i, k_blk, v_blk = carry
        s = jnp.einsum(
            "bhid,bhjd->bhij", q.astype(jnp.float32),
            k_blk.astype(jnp.float32)
        ) * scale
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhij,bhjd->bhid", pexp, v_blk.astype(jnp.float32))
        # rotate k/v to the next device on the ring
        perm = [(i, (i + 1) % p) for i in range(p)]
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (acc, m_new, l_new, k_next, v_next), None

    b, h, n, d = q.shape
    acc0 = jnp.zeros((b, h, n, d), jnp.float32)
    m0 = jnp.full((b, h, n, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, n, 1), jnp.float32)
    (acc, m_i, l_i, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v), None, length=p)
    return (acc / l_i).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention with the token axis sharded over ``mesh[axis]``.

    q/k/v: [B, H, N, D] global shapes; N must divide by the axis size.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    spec = P(None, None, axis, None)
    fn = shard_map(
        functools.partial(_ring_body, scale=float(scale), axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# Context-parallel execution inside a jitted model
# ---------------------------------------------------------------------------
#
# The attention modules (`nn/attention.py` CrossAttention, the VAE attention
# block) route their self-attention through `context_ring_attention` when
# their static ``seq_axis`` is set.  The mesh can't travel through flax
# module trees cleanly, so the sampler wrapper registers it here before
# tracing (`parallel/context.py:context_parallel_pipeline`).

_CONTEXT_MESH: Optional[Mesh] = None


def set_context_mesh(mesh: Optional[Mesh]) -> None:
    global _CONTEXT_MESH
    _CONTEXT_MESH = mesh


def get_context_mesh() -> Mesh:
    if _CONTEXT_MESH is None:
        raise RuntimeError(
            "seq_axis is set on an attention module but no context mesh is "
            "registered — build the model through "
            "parallel.context.context_parallel_pipeline (or call "
            "set_context_mesh) before tracing")
    return _CONTEXT_MESH


def context_ring_attention(q, k, v, scale: float, axis: str) -> jnp.ndarray:
    """Ring self-attention for use *inside* a jitted model: the surrounding
    program is GSPMD-partitioned (convs/norms get automatic halo/psum
    handling from XLA); this shard_map island keeps the N² attention from
    ever materializing an unsharded score matrix or an all-gathered K/V."""
    return ring_attention(q, k, v, get_context_mesh(), axis=axis,
                          scale=scale)


def constrain_seq(x: jnp.ndarray, axis: Optional[str],
                  dim: int = 1) -> jnp.ndarray:
    """Pin array dim ``dim`` (H for NHWC feature maps, N for token tensors)
    to the context-mesh axis with ``with_sharding_constraint``.

    Without these pins the GSPMD partitioner is free to re-layout at every
    residual/adapter/proj_out add — on the UNet it oscillated between
    H-sharded and H×W-sharded layouts, logging "Involuntary full
    rematerialization" and paying a replicate+repartition per flip.  One
    explicit H-shard at each block junction makes a single layout flow
    through the whole network.  No-op when ``axis`` is None or no context
    mesh is registered (the same model code traces on single devices)."""
    if axis is None or _CONTEXT_MESH is None:
        return x
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(_CONTEXT_MESH, P(*spec)))


def make_sh(seq_axis: Optional[str]):
    """Per-junction H-shard pin for context parallelism: returns
    ``constrain_seq(·, seq_axis)`` or the identity when ``seq_axis`` is
    None — the shared helper every seq-axis-aware module (UNet,
    ControlNet, VAE, SpatialTransformer) applies at its block junctions."""
    if seq_axis is None:
        return lambda t: t
    return lambda t: constrain_seq(t, seq_axis)
