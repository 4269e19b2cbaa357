"""Frozen CLIP text tower (ViT-L/14 text config) — the cond stage.

Mirrors the reference's ``FrozenCLIPEmbedder``
(`/root/reference/ldm/modules/encoders/modules.py:137-162`): HF
``openai/clip-vit-large-patch14`` text model, 77 tokens, returns the
[B, 77, 768] ``last_hidden_state``.  Weights are ingested from the SD torch
checkpoint (``cond_stage_model.transformer.*`` keys) by
``fgdm_tpu.checkpoint.torch_ingest`` — no network access needed.

Architecture (CLIPTextModel): token+position embeddings → 12 pre-LN
transformer layers (causal mask, quick-gelu MLP) → final LayerNorm.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
import re
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fgdm_tpu.nn.layers import Dense, LayerNorm32

Dtype = Any


class CLIPAttention(nn.Module):
    embed_dim: int = 768
    num_heads: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        d_head = self.embed_dim // self.num_heads
        scale = d_head**-0.5
        b, n, _ = x.shape
        q = Dense(self.embed_dim, dtype=self.dtype, name="q_proj")(x) * scale
        k = Dense(self.embed_dim, dtype=self.dtype, name="k_proj")(x)
        v = Dense(self.embed_dim, dtype=self.dtype, name="v_proj")(x)

        def split(t):
            return t.reshape(b, n, self.num_heads, d_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        sim = jnp.einsum("bhid,bhjd->bhij", qh.astype(jnp.float32),
                         kh.astype(jnp.float32))
        sim = sim + causal_mask
        attn = jax.nn.softmax(sim, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.embed_dim)
        return Dense(self.embed_dim, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    embed_dim: int = 768
    num_heads: int = 12
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        h = LayerNorm32(name="layer_norm1")(x)
        x = x + CLIPAttention(self.embed_dim, self.num_heads, dtype=self.dtype,
                              name="self_attn")(h, causal_mask)
        h = LayerNorm32(name="layer_norm2")(x)
        h = Dense(self.embed_dim * self.mlp_ratio, dtype=self.dtype, name="fc1")(h)
        # quick_gelu
        h = h * jax.nn.sigmoid(1.702 * h.astype(jnp.float32)).astype(h.dtype)
        h = Dense(self.embed_dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    vocab_size: int = 49408
    embed_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        b, n = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.embed_dim,
                       param_dtype=jnp.float32, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.zeros,
            (self.max_length, self.embed_dim), jnp.float32,
        )
        x = tok.astype(self.dtype) + pos[None, :n].astype(self.dtype)
        causal = jnp.triu(
            jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1
        )[None, None]
        for i in range(self.num_layers):
            x = CLIPEncoderLayer(self.embed_dim, self.num_heads,
                                 dtype=self.dtype, name=f"layers_{i}")(x, causal)
        x = LayerNorm32(name="final_layer_norm")(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class CLIPTokenizer:
    """Byte-level BPE tokenizer matching openai/clip-vit-large-patch14.

    Requires ``vocab.json`` + ``merges.txt`` (or the original
    ``bpe_simple_vocab_16e6.txt.gz``).  When no vocab files are available
    (air-gapped test environments) it degrades to a deterministic hash
    tokenizer — stable ids, correct shapes/special tokens, but not parity
    with real CLIP ids; supply vocab files for production use.
    """

    BOT = 49406
    EOT = 49407

    def __init__(self, vocab_dir: Optional[str] = None, max_length: int = 77):
        self.max_length = max_length
        self._bpe_ranks = None
        self._encoder = None
        vocab_dir = vocab_dir or os.environ.get("FGDM_CLIP_VOCAB_DIR")
        if vocab_dir:
            self._load_vocab(vocab_dir)
        self._byte_encoder = _bytes_to_unicode()
        # the exact CLIP pre-tokenization pattern (reference tokenizer /
        # HF CLIPTokenizer); the `regex` module supports \p{L}/\p{N}
        import regex

        self._pat = regex.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"""
            r"""|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            regex.IGNORECASE,
        )
        self._cache = {}

    def check_production(self, context: str = "this run") -> None:
        """Fail loud when real weights meet the hash-fallback tokenizer.

        The hash fallback produces stable ids with correct shapes but NOT
        CLIP id parity — running a real checkpoint with it silently degrades
        output quality.  Set FGDM_ALLOW_HASH_TOKENIZER=1 to override (smoke
        tests only)."""
        if self.has_real_vocab:
            return
        if os.environ.get("FGDM_ALLOW_HASH_TOKENIZER") == "1":
            print("[tokenizer] WARNING: hash-fallback tokenizer with real "
                  f"weights in {context} (FGDM_ALLOW_HASH_TOKENIZER=1)")
            return
        raise SystemExit(
            f"[tokenizer] {context} loaded real model weights but no CLIP "
            "vocab is available — token ids would NOT match CLIP and output "
            "quality would silently degrade. Point FGDM_CLIP_VOCAB_DIR (or "
            "--vocab_dir) at a directory with vocab.json + merges.txt, or "
            "set FGDM_ALLOW_HASH_TOKENIZER=1 to proceed anyway.")

    def _load_vocab(self, vocab_dir: str):
        vpath = os.path.join(vocab_dir, "vocab.json")
        mpath = os.path.join(vocab_dir, "merges.txt")
        if os.path.exists(vpath) and os.path.exists(mpath):
            with open(vpath) as f:
                self._encoder = json.load(f)
            with open(mpath) as f:
                merges = f.read().split("\n")
            merges = [tuple(m.split()) for m in merges if m and not m.startswith("#")]
            self._bpe_ranks = dict(zip(merges, range(len(merges))))

    @property
    def has_real_vocab(self) -> bool:
        return self._encoder is not None

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(
                pairs, key=lambda p: self._bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self._bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        self._cache[token] = list(word)
        return list(word)

    def encode_text(self, text: str) -> List[int]:
        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text.strip()).lower()
        ids: List[int] = []
        for tok in self._pat.findall(text):
            tok = "".join(self._byte_encoder[b] for b in tok.encode("utf-8"))
            if self._encoder is not None:
                for piece in self._bpe(tok):
                    ids.append(self._encoder.get(piece, 0))
            else:
                # deterministic fallback: stable hash into non-special range
                import zlib

                ids.append(zlib.crc32(tok.encode("utf-8")) % 49000 + 1)
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        """Tokenize to padded [B, max_length] int32 ids (BOT … EOT pad-EOT)."""
        out = np.full((len(texts), self.max_length), self.EOT, dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.BOT] + self.encode_text(t)[: self.max_length - 2] + [self.EOT]
            out[i, : len(ids)] = np.asarray(ids, dtype=np.int32)
        return out
