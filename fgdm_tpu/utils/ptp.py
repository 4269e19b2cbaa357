"""Prompt-to-prompt attention control — compiled-in editors, no monkeypatch.

Functional re-design of `/root/reference/utils/ptp_utils.py:333-675`.  The
reference monkeypatches ``CrossAttention.forward`` and mutates a stateful
controller object per call; here an **editor closure** is threaded through
the UNet (``attn_editor`` argument) and compiled into the sampling program:

* ``AttentionStore``  → editors append selected probability maps to a
  trace-local list the sampler reads back in-graph (no host sync).
* ``AttentionReplace``/``Refine``/``Reweight`` → pure functions of
  (probs, step) using precomputed mappers from `fgdm_tpu.utils.seq_aligner`;
  edits apply to the conditional half of the fused-CFG batch, batch item 0
  is the base prompt (matching ptp_utils.py:512-520, 596-614).
* ``LocalBlend``      → mask from accumulated 16² cross maps blending edited
  latents toward the base latent (ptp_utils.py:437-471 semantics).
* ``get_equalizer``   → token reweighting vectors (ptp_utils.py:478-489).

``ptp_sample`` runs the whole edit as one ``lax.scan`` DDIM program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from fgdm_tpu.core.schedules import DDIMSchedule
from fgdm_tpu.utils import seq_aligner


# ---------------------------------------------------------------------------
# Time-dependent word alphas (ptp_utils.py get_time_words_attention_alpha)
# ---------------------------------------------------------------------------

def get_time_words_attention_alpha(
    prompts: Sequence[str],
    num_steps: int,
    cross_replace_steps: Union[float, Tuple[float, float], Dict[str, Any]],
    tokenizer,
    max_len: int = 77,
) -> np.ndarray:
    """[num_steps+1, P-1, 1, 1, 77] — 1 where the cross map is replaced."""
    if not isinstance(cross_replace_steps, dict):
        cross_replace_steps = {"default_": cross_replace_steps}
    if "default_" not in cross_replace_steps:
        cross_replace_steps["default_"] = (0.0, 1.0)

    def bounds(spec):
        if isinstance(spec, float) or isinstance(spec, int):
            return 0.0, float(spec)
        return float(spec[0]), float(spec[1])

    lo, hi = bounds(cross_replace_steps["default_"])
    alphas = np.zeros((num_steps + 1, len(prompts) - 1, max_len), np.float32)
    steps = np.arange(num_steps + 1) / num_steps
    default_on = ((steps >= lo) & (steps < hi)).astype(np.float32)
    alphas[:] = default_on[:, None, None]
    for word, spec in cross_replace_steps.items():
        if word == "default_":
            continue
        wlo, whi = bounds(spec)
        on = ((steps >= wlo) & (steps < whi)).astype(np.float32)
        for p_idx, prompt in enumerate(prompts[1:]):
            inds = seq_aligner.get_word_inds(prompt, word, tokenizer)
            for t in range(num_steps + 1):
                alphas[t, p_idx, inds] = on[t]
    return alphas.reshape(num_steps + 1, len(prompts) - 1, 1, 1, max_len)


def get_equalizer(
    text: str,
    word_select: Union[str, Sequence[str]],
    values: Sequence[float],
    tokenizer,
    max_len: int = 77,
) -> np.ndarray:
    """[len(values), 77] token reweighting vectors."""
    if isinstance(word_select, str):
        word_select = (word_select,)
    eq = np.ones((len(values), max_len), np.float32)
    for word in word_select:
        inds = seq_aligner.get_word_inds(text, word, tokenizer)
        for vi, v in enumerate(values):
            eq[vi, inds] = v
    return eq


# ---------------------------------------------------------------------------
# Controllers
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class EditController:
    """Static editing recipe; ``editor(step)`` returns the compiled-in
    attention transform for that (traced) step."""

    kind: str                                  # replace | refine | reweight
    num_steps: int
    batch_size: int                            # number of prompts P
    cross_replace_alpha: jnp.ndarray           # [S+1, P-1, 1, 1, 77]
    self_replace_lo: int
    self_replace_hi: int
    mapper_matrix: Optional[jnp.ndarray] = None   # replace [P-1,77,77]
    mapper_idx: Optional[jnp.ndarray] = None      # refine  [P-1,77]
    alphas: Optional[jnp.ndarray] = None          # refine  [P-1,1,1,77]
    equalizer: Optional[jnp.ndarray] = None       # reweight [P-1,77]
    inner: Optional["EditController"] = None      # reweight chaining
    self_edit_max_res: int = 256                  # 16² (ptp_utils.py:592)
    cfg_doubled: bool = True
    store: Optional[List] = None                  # trace-local map capture
    store_res: int = 256                          # collect 16² cross maps

    def replace_cross(self, base, edits):
        """base [h,N,77], edits [P-1,h,N,77] → edited cross probs."""
        if self.kind == "replace":
            return jnp.einsum("hpw,bwn->bhpn", base, self.mapper_matrix)
        if self.kind == "refine":
            perm = jnp.take(base, self.mapper_idx, axis=-1)  # [h,N,P-1,77]
            perm = jnp.moveaxis(perm, 2, 0)                  # [P-1,h,N,77]
            return perm * self.alphas + edits * (1 - self.alphas)
        if self.kind == "reweight":
            b = base
            if self.inner is not None:
                b = self.inner.replace_cross(base, edits)
                return b * self.equalizer[:, None, None, :]
            return base[None] * self.equalizer[:, None, None, :]
        raise ValueError(self.kind)

    def editor(self, step):
        """step: traced int scan index (ascending over sampler steps)."""

        def edit(probs, is_cross, place):
            del place
            if self.store is not None and is_cross and \
                    probs.shape[2] == self.store_res:
                self.store.append(probs)
            P = self.batch_size
            if self.cfg_doubled:
                uncond, cond = jnp.split(probs, 2, axis=0)
            else:
                uncond, cond = None, probs
            base, edits = cond[:1], cond[1:]
            if is_cross:
                alpha = self.cross_replace_alpha[step]
                new = self.replace_cross(base[0], edits)
                edits = new * alpha + (1 - alpha) * edits
            else:
                if probs.shape[2] <= self.self_edit_max_res:
                    on = jnp.logical_and(step >= self.self_replace_lo,
                                         step < self.self_replace_hi)
                    replaced = jnp.broadcast_to(base, edits.shape)
                    edits = jnp.where(on, replaced, edits)
            cond = jnp.concatenate([base, edits], axis=0)
            if uncond is None:
                return cond
            return jnp.concatenate([uncond, cond], axis=0)

        return edit


def make_controller(
    prompts: Sequence[str],
    tokenizer,
    num_steps: int,
    kind: str = "refine",
    cross_replace_steps: Union[float, Dict[str, Any]] = 0.8,
    self_replace_steps: Union[float, Tuple[float, float]] = 0.4,
    equalizer: Optional[np.ndarray] = None,
    inner: Optional[EditController] = None,
    cfg_doubled: bool = True,
) -> EditController:
    alpha = get_time_words_attention_alpha(
        prompts, num_steps, cross_replace_steps, tokenizer
    )
    if isinstance(self_replace_steps, (int, float)):
        self_replace_steps = (0.0, float(self_replace_steps))
    lo = int(num_steps * self_replace_steps[0])
    hi = int(num_steps * self_replace_steps[1])
    ctl = EditController(
        kind=kind,
        num_steps=num_steps,
        batch_size=len(prompts),
        cross_replace_alpha=jnp.asarray(alpha),
        self_replace_lo=lo,
        self_replace_hi=hi,
        inner=inner,
        cfg_doubled=cfg_doubled,
    )
    if kind == "replace":
        ctl.mapper_matrix = jnp.asarray(
            seq_aligner.get_replacement_mapper(prompts, tokenizer))
    elif kind == "refine":
        m, a = seq_aligner.get_refinement_mapper(prompts, tokenizer)
        ctl.mapper_idx = jnp.asarray(m)
        ctl.alphas = jnp.asarray(a).reshape(len(prompts) - 1, 1, 1, -1)
    elif kind == "reweight":
        assert equalizer is not None
        ctl.equalizer = jnp.asarray(equalizer)
    else:
        raise ValueError(kind)
    return ctl


# ---------------------------------------------------------------------------
# LocalBlend
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class LocalBlend:
    """Blend edited latents toward the base only where the selected words
    attend (ptp_utils.py:437-471)."""

    alpha_layers: jnp.ndarray      # [P, 1, 1, 1, 1, 77] word-select mask
    threshold: float = 0.3

    @staticmethod
    def create(prompts: Sequence[str], words: Sequence, tokenizer,
               max_len: int = 77, threshold: float = 0.3) -> "LocalBlend":
        alpha = np.zeros((len(prompts), 1, 1, 1, 1, max_len), np.float32)
        for i, (prompt, ws) in enumerate(zip(prompts, words)):
            if isinstance(ws, str):
                ws = [ws]
            for w in ws:
                inds = seq_aligner.get_word_inds(prompt, w, tokenizer)
                alpha[i, ..., inds] = 1.0
        return LocalBlend(jnp.asarray(alpha), threshold)

    def __call__(self, x_t: jnp.ndarray, maps: Sequence[jnp.ndarray]
                 ) -> jnp.ndarray:
        """x_t: [P, H, W, C]; maps: list of cross probs [P(,2P),h,256,77]."""
        P = x_t.shape[0]
        res = 16
        stack = []
        for m in maps:
            if m.shape[0] == 2 * P:          # drop the uncond half
                m = m[P:]
            stack.append(m.reshape(P, -1, 1, res, res, m.shape[-1]))
        mm = jnp.concatenate(stack, axis=1).astype(jnp.float32)
        mm = (mm * self.alpha_layers).sum(-1).mean(1)       # [P,1,16,16]
        mask = jax.image.resize(
            jnp.transpose(mm, (0, 2, 3, 1)),
            (P, x_t.shape[1], x_t.shape[2], 1), "nearest",
        )
        mask = mask / (mask.max(axis=(1, 2, 3), keepdims=True) + 1e-8)
        mask = (mask > self.threshold).astype(x_t.dtype)
        return x_t[:1] + mask * (x_t - x_t[:1])
