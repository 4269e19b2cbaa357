"""Spatial transformer stack (self + cross attention) with native map capture.

Behavioural contract mirrors `/root/reference/ldm/modules/attention.py`:

* ``CrossAttention`` — q/k/v projections without bias, ``scale = d_head**-0.5``,
  output projection with bias (`attention.py:152-216`).  When ``capture`` is
  set it also returns the head-averaged *pre-softmax* score map, which is what
  the reference's forward hooks harvest for the distillation loss
  (`attention.py:170-175`; hook consumption `ddpm.py:1739-1766`).  Capture is
  a **static** flag: the fast path compiles with zero capture overhead, and
  the attention math runs through the Pallas flash kernel on TPU.
* ``adapt_q`` reproduces the adapter-query branch: attention re-run with an
  external query tensor, outputs summed (`attention.py:203-214`).
* ``BasicTransformerBlock`` — self-attn → cross-attn → GEGLU FF, each with a
  pre-LayerNorm residual (`attention.py:219-241`).
* ``SpatialTransformer`` — GroupNorm(eps 1e-6) → 1×1 proj_in → blocks →
  zero-init 1×1 proj_out + residual (`attention.py:252-292`).

Tensors are NHWC / [B, N, C]; rematerialization is applied at the UNet level
via ``jax.checkpoint`` rather than per-block torch checkpointing.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.kernels.attention import attention_with_scores, multihead_attention
from fgdm_tpu.nn.layers import Conv2d, Dense, GroupNorm32, LayerNorm32

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CaptureSpec:
    """Static (hashable) capture filter: which maps to emit, at what pooling.

    The distillation loss consumes self-attention maps at exactly ONE token
    count (the loss resolution — or 2× that for the teacher, immediately
    pooled back down, ddpm.py:1799-1818).  Plain ``capture=True`` computes
    and materializes the head-averaged map for *every* attention layer and
    lets the consumer discard the mismatched ones; a spec skips those
    einsums entirely (the layer runs the plain flash path) and folds the
    consumer's pooling into q/k before the score einsum (see
    ``attention_with_scores(pool_kq=)`` for the exactness argument).

    ``self_n``: emit self-attention maps only for layers whose token count
    equals this (None = all layers).  ``self_pool``: flat-window average-
    pool factor applied to both token axes of emitted self maps.  Cross-
    attention maps are always emitted unpooled (all layers feed the loss).
    """

    mode: str = "sim"          # "sim" | "probs"
    self_n: Optional[int] = None
    self_pool: int = 1


class CrossAttention(nn.Module):
    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32
    # context parallelism: mesh axis the token dim is sharded over.  Only
    # self-attention rings (cross-attention K/V is 77 replicated tokens —
    # the plain einsum is already local under GSPMD).
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        adapt_q: Optional[jnp.ndarray] = None,
        capture=False,  # False | True/'sim' | 'probs' (static)
        attn_editor=None,  # Callable[[probs BHNK, is_cross], probs] — ptp
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        h = self.heads
        inner = self.dim_head * h
        scale = self.dim_head ** -0.5
        is_cross = context is not None
        ctx = x if context is None else context

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        def merge(t):
            b, hh, n, d = t.shape
            return t.transpose(0, 2, 1, 3).reshape(b, n, hh * d)

        qh, kh, vh = split(q), split(k), split(v)
        # static capture modes: False = none; True/"sim" = head-averaged
        # pre-softmax sim (the reference hook output ``out[1]``,
        # attention.py:170-175 — distillation path); "probs" = per-head
        # post-softmax probabilities [B,h,N,M] (the ``*M`` classes' output,
        # attention.py:341-342 — inference-time alignment guidance path);
        # CaptureSpec = filtered/pooled "sim" (distillation fast path).
        spec = capture if isinstance(capture, CaptureSpec) else None
        mode = spec.mode if spec is not None else capture
        want_probs = mode == "probs"
        probs = None
        if attn_editor is not None or want_probs:
            # explicit-probability path: softmax probs are materialized,
            # optionally routed through the editor (prompt-to-prompt
            # injection — replaces the reference's CrossAttention
            # monkeypatch, utils/ptp_utils.py:333-400), then applied to v.
            sim = jnp.einsum(
                "bhid,bhjd->bhij", qh.astype(jnp.float32),
                kh.astype(jnp.float32)
            ) * scale
            attn = jax.nn.softmax(sim, axis=-1)
            if attn_editor is not None:
                attn = attn_editor(attn, is_cross)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(vh.dtype), vh)
            if want_probs:
                probs = attn
            elif capture:
                probs = jnp.mean(sim, axis=1)
        elif spec is not None and not is_cross and (
            spec.self_n is not None and x.shape[1] != spec.self_n
        ):
            # filtered out by the spec: this layer's self map would be
            # discarded by the consumer — skip the score einsum entirely
            out = multihead_attention(qh, kh, vh, scale)
        elif capture:
            # capture materializes an [B,Nq,Nk] score map — on a
            # context-parallel model (seq_axis set) that would silently
            # departition/all-gather an N² tensor instead of ringing
            assert self.seq_axis is None or is_cross, (
                "attention capture is not supported on a context-parallel "
                "model (token axis is sharded; the score map is global)")
            pool = spec.self_pool if (spec is not None and not is_cross) else 1
            out, probs = attention_with_scores(qh, kh, vh, scale, pool_kq=pool)
        elif self.seq_axis is not None and not is_cross:
            from fgdm_tpu.parallel.ring_attention import context_ring_attention

            out = context_ring_attention(qh, kh, vh, scale, self.seq_axis)
        else:
            out = multihead_attention(qh, kh, vh, scale)
        out = merge(out)

        if adapt_q is not None:
            aq = split(adapt_q)
            out = out + merge(multihead_attention(aq, kh, vh, scale))

        out = Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return out, probs


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * jax.nn.gelu(gate.astype(jnp.float32)).astype(x.dtype)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    glu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        else:
            x = Dense(inner, dtype=self.dtype, name="net_0")(x)
            x = jax.nn.gelu(x.astype(jnp.float32)).astype(x.dtype)
        return Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    gated_ff: bool = True
    dtype: Dtype = jnp.float32
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        adapt_q: Optional[jnp.ndarray] = None,
        capture=False,  # False | True/'sim' | 'probs' (static)
        attn_editor=None,
    ):
        y1, self_probs = CrossAttention(
            self.dim, heads=self.n_heads, dim_head=self.d_head,
            dtype=self.dtype, seq_axis=self.seq_axis, name="attn1",
        )(LayerNorm32(name="norm1")(x), capture=capture,
          attn_editor=attn_editor)
        x = y1 + x
        y2, cross_probs = CrossAttention(
            self.dim, context_dim=self.context_dim, heads=self.n_heads,
            dim_head=self.d_head, dtype=self.dtype, name="attn2",
        )(LayerNorm32(name="norm2")(x), context=context, adapt_q=adapt_q,
          capture=capture, attn_editor=attn_editor)
        x = y2 + x
        x = FeedForward(self.dim, glu=self.gated_ff, dtype=self.dtype, name="ff")(
            LayerNorm32(name="norm3")(x)
        ) + x
        return x, (self_probs, cross_probs)


class SpatialTransformer(nn.Module):
    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        adapt_q: Optional[jnp.ndarray] = None,
        capture=False,  # False | True/'sim' | 'probs' (static)
        attn_editor=None,
    ):
        b, hh, ww, c = x.shape
        inner = self.n_heads * self.d_head
        # context parallelism: the NHWC H-shard flattens to a contiguous
        # token shard ([B,H,W,C] row-major → [B,N,C]); pin it at the
        # reshape/residual junctions so GSPMD keeps one layout instead
        # of thrashing at the proj_in/proj_out adds
        from fgdm_tpu.parallel.ring_attention import make_sh

        sh = make_sh(self.seq_axis)
        x_in = x
        x = GroupNorm32(num_groups=32, eps=1e-6, name="norm")(x)
        x = Conv2d(inner, kernel_size=1, padding=0, dtype=self.dtype, name="proj_in")(x)
        x = sh(x.reshape(b, hh * ww, inner))
        probs = None
        for d in range(self.depth):
            x, probs = BasicTransformerBlock(
                inner, self.n_heads, self.d_head, context_dim=self.context_dim,
                dtype=self.dtype, seq_axis=self.seq_axis,
                name=f"transformer_blocks_{d}",
            )(x, context=context, adapt_q=adapt_q, capture=capture,
              attn_editor=attn_editor)
            x = sh(x)
        x = sh(x.reshape(b, hh, ww, inner))
        x = Conv2d(
            self.in_channels, kernel_size=1, padding=0, zero_init=True,
            dtype=self.dtype, name="proj_out",
        )(x)
        return sh(x + x_in), probs


class PixelAttentionBlock(nn.Module):
    """Legacy pixel-space self-attention for ``use_spatial_transformer=False``
    UNets (reference ``AttentionBlock``/``QKVAttention[Legacy]``,
    `/root/reference/ldm/modules/diffusionmodules/openaimodel.py:304-434`):
    GroupNorm(32) → fused qkv 1×1 projection over flattened spatial tokens →
    per-head softmax attention with the reference's symmetric ``ch**-0.25``
    q/k scaling → zero-initialized output projection → residual.

    ``use_new_attention_order`` selects the qkv channel layout: legacy packs
    heads outermost ([H, 3, ch] per token), the new order packs q/k/v
    outermost ([3, H, ch]) — same math, different checkpoint layout.  No
    context/capture/editor: the reference block is self-attention only.
    """

    channels: int
    num_heads: int = 1
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        assert c == self.channels and c % self.num_heads == 0, (c, self.num_heads)
        nh = self.num_heads
        ch = c // nh
        n = hh * ww
        xf = x.reshape(b, n, c)
        h = GroupNorm32(num_groups=32, name="norm")(xf)
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(h)     # [B, N, 3c]
        if self.use_new_attention_order:
            qkv = qkv.reshape(b, n, 3, nh, ch)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, ch]
        else:
            qkv = qkv.reshape(b, n, nh, 3, ch)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        # [B, H, N, ch] with the reference's split ch**-0.25 scaling on both
        # operands (f16-stable form); softmax in f32
        scale = float(ch) ** -0.25
        q = q.transpose(0, 2, 1, 3) * scale
        k = k.transpose(0, 2, 1, 3) * scale
        v = v.transpose(0, 2, 1, 3)
        w = jnp.einsum("bhtc,bhsc->bhts", q, k,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bhsc->bhtc", w, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, n, c)
        out = Dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(a)
        return (xf + out).reshape(b, hh, ww, c)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling of a spatial feature map to one vector
    (reference ``AttentionPool2d``,
    `/root/reference/ldm/modules/diffusionmodules/openaimodel.py:37-64`
    — defined there for classifier heads but never instantiated by any
    shipped config; implemented for surface completeness).

    A mean token is prepended to the flattened spatial tokens, a learned
    positional embedding (torch layout ``[C, N+1]``, kept for state-dict
    fidelity) is added, and one round of multi-head self-attention in the
    reference's *new* qkv order (q/k/v outermost, symmetric ``ch**-0.25``
    scaling) produces the pooled first token through ``c_proj``.
    """

    spacial_dim: int
    embed_dim: int
    num_heads_channels: int
    output_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hh, ww, c = x.shape
        assert c == self.embed_dim, (c, self.embed_dim)
        assert hh * ww == self.spacial_dim ** 2, (hh, ww, self.spacial_dim)
        assert c % self.num_heads_channels == 0, (c, self.num_heads_channels)
        ch = self.num_heads_channels
        nh = c // ch
        tok = x.reshape(b, hh * ww, c)
        tok = jnp.concatenate([tok.mean(axis=1, keepdims=True), tok], axis=1)
        t = tok.shape[1]  # N + 1
        pos = self.param(
            "positional_embedding",
            lambda k: jax.random.normal(k, (c, t), jnp.float32) / c ** 0.5,
        )
        tok = tok + jnp.transpose(pos)[None].astype(tok.dtype)
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv_proj")(tok)  # [B,T,3C]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(u: jnp.ndarray) -> jnp.ndarray:  # [B,T,C] → [B,H,T,ch]
            return u.reshape(b, t, nh, ch).transpose(0, 2, 1, 3)

        scale = float(ch) ** -0.25
        w = jnp.einsum("bhtc,bhsc->bhts", heads(q) * scale, heads(k) * scale,
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bhsc->bhtc", w, heads(v))
        a = a.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = Dense(self.output_dim or c, dtype=self.dtype, name="c_proj")(a)
        return out[:, 0]
