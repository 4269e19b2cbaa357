"""Token-sequence alignment for prompt editing (host-side preprocessing).

Behavioural mirror of `/root/reference/utils/seq_aligner.py:62-196`:
Needleman-Wunsch global alignment between tokenized prompts producing
* ``get_refinement_mapper`` — per-edit token index mapper + alpha mask
  (1 where the target token maps to a source token) for AttentionRefine;
* ``get_replacement_mapper`` — [77,77] soft permutation matrices for
  AttentionReplace (word-level substitution with length-mismatch spreading);
* ``get_word_inds`` — word → token-position lookup for equalizers.

All outputs are numpy; they become static inputs to the jitted editing
sampler.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import numpy as np

GAP = 0          # score params (reference ScoreParams(0, 1, -1))
MATCH = 1
MISMATCH = -1


def global_align(x: Sequence[int], y: Sequence[int]) -> np.ndarray:
    """NW alignment trace-back matrix (1=left/gap-x, 2=up/gap-y, 3=diag)."""
    n, m = len(x), len(y)
    matrix = np.zeros((n + 1, m + 1), np.int32)
    matrix[0, :] = np.arange(m + 1) * GAP
    matrix[:, 0] = np.arange(n + 1) * GAP
    trace = np.zeros((n + 1, m + 1), np.int32)
    trace[0, 1:] = 1
    trace[1:, 0] = 2
    trace[0, 0] = 4
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            left = matrix[i, j - 1] + GAP
            up = matrix[i - 1, j] + GAP
            diag = matrix[i - 1, j - 1] + (
                MATCH if x[i - 1] == y[j - 1] else MISMATCH
            )
            best = max(left, up, diag)
            matrix[i, j] = best
            if best == left:
                trace[i, j] = 1
            elif best == up:
                trace[i, j] = 2
            else:
                trace[i, j] = 3
    return trace


def aligned_mapper(x: Sequence[int], y: Sequence[int]) -> np.ndarray:
    """y-position → x-position pairs (−1 where y has no source)."""
    trace = global_align(x, y)
    i, j = len(x), len(y)
    pairs: List[Tuple[int, int]] = []
    while i > 0 or j > 0:
        t = trace[i, j]
        if t == 3:
            i -= 1
            j -= 1
            pairs.append((j, i))
        elif t == 1:
            j -= 1
            pairs.append((j, -1))
        elif t == 2:
            i -= 1
        else:
            break
    pairs.reverse()
    return np.asarray(pairs, np.int64).reshape(-1, 2)


def get_mapper(x_ids: Sequence[int], y_ids: Sequence[int], max_len: int = 77
               ) -> Tuple[np.ndarray, np.ndarray]:
    base = aligned_mapper(list(x_ids), list(y_ids))
    alphas = np.ones(max_len, np.float32)
    alphas[: base.shape[0]] = (base[:, 1] != -1).astype(np.float32)
    mapper = np.zeros(max_len, np.int64)
    mapper[: base.shape[0]] = base[:, 1]
    mapper[base.shape[0]:] = len(y_ids) + np.arange(max_len - len(y_ids))
    return mapper, alphas


def get_refinement_mapper(prompts: Sequence[str], tokenizer, max_len: int = 77
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """[P-1, 77] mappers + alphas between prompts[0] and each edit."""
    def enc(p):
        return [tokenizer.BOT] + tokenizer.encode_text(p) + [tokenizer.EOT]

    x_ids = enc(prompts[0])
    mappers, alphas = [], []
    for p in prompts[1:]:
        y_ids = enc(p)
        m, a = get_mapper(x_ids, y_ids, max_len)
        mappers.append(m)
        alphas.append(a)
    return np.stack(mappers), np.stack(alphas)


def get_word_inds(text: str, word_place: Union[int, str], tokenizer
                  ) -> np.ndarray:
    """Token indices (1-based, after BOT) covering the given word."""
    split_text = text.split(" ")
    if isinstance(word_place, str):
        places = [i for i, w in enumerate(split_text) if w == word_place]
    else:
        places = [word_place]
    ids = tokenizer.encode_text(text)
    # crude per-word token counts via re-encoding each word
    out = []
    ptr = 1  # position 0 is BOT in the padded sequence
    for wi, word in enumerate(split_text):
        n = max(len(tokenizer.encode_text(word)), 1)
        if wi in places:
            out.extend(range(ptr, ptr + n))
        ptr += n
    return np.asarray(out, np.int64)


def get_replacement_mapper_(x: str, y: str, tokenizer, max_len: int = 77
                            ) -> np.ndarray:
    words_x = x.split(" ")
    words_y = y.split(" ")
    if len(words_x) != len(words_y):
        raise ValueError(
            "attention replacement edit needs equal-length prompts; got "
            f"{len(words_x)} vs {len(words_y)} words"
        )
    inds_replace = [i for i in range(len(words_y)) if words_y[i] != words_x[i]]
    inds_source = [get_word_inds(x, i, tokenizer) for i in inds_replace]
    inds_target = [get_word_inds(y, i, tokenizer) for i in inds_replace]
    mapper = np.zeros((max_len, max_len), np.float32)
    i = j = 0
    cur = 0
    while i < max_len and j < max_len:
        if cur < len(inds_source) and len(inds_source[cur]) and \
                inds_source[cur][0] == i:
            src, tgt = inds_source[cur], inds_target[cur]
            if len(src) == len(tgt):
                mapper[src, tgt] = 1.0
            else:
                ratio = 1.0 / len(tgt)
                for t in tgt:
                    mapper[src, t] = ratio
            cur += 1
            i += len(src)
            j += len(tgt)
        elif cur < len(inds_source):
            mapper[i, j] = 1.0
            i += 1
            j += 1
        else:
            mapper[j, j] = 1.0
            i += 1
            j += 1
    return mapper


def get_replacement_mapper(prompts: Sequence[str], tokenizer,
                           max_len: int = 77) -> np.ndarray:
    return np.stack([
        get_replacement_mapper_(prompts[0], p, tokenizer, max_len)
        for p in prompts[1:]
    ])
