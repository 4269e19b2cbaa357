"""Torch → flax ingest for annotator checkpoints.

Covers the shipped annotator weights:
* ``ControlNetHED.pth``  (`/root/reference/ldm/models/hed.py:58-65`)
* ``table5_pidinet.pth`` (`ldm/models/model_edge.py:646-649`; keys carry a
  ``module.`` prefix and ``init_block/block{s}_{i}/dilations/attentions/
  conv_reduces/classifier`` names)

MiDaS (``dpt_hybrid``) and UniFormer (``upernet_global_small.pth``) mappers
resolve the major substructures by name; unmatched keys are reported so the
first run against real weights pinpoints any residual naming drift.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from flax import traverse_util

from fgdm_tpu.checkpoint.torch_ingest import (
    TensorDict,
    _conv_kernel,
    _linear_kernel,
)


def _assemble(flat: Dict[Tuple[str, ...], np.ndarray], expect=None):
    params = traverse_util.unflatten_dict(flat)
    tree = {"params": params}
    missing: List[str] = []
    if expect is not None:
        exp = traverse_util.flatten_dict(expect, sep="/")
        got = traverse_util.flatten_dict(tree, sep="/")
        for k, v in exp.items():
            if k not in got:
                missing.append(k)
                got[k] = np.asarray(v)
            elif tuple(got[k].shape) != tuple(v.shape):
                raise ValueError(f"shape mismatch at {k}: {got[k].shape} vs {v.shape}")
        got = {k: v for k, v in got.items() if k in exp}
        tree = traverse_util.unflatten_dict(got, sep="/")
    return tree, missing


def ingest_hed(sd: TensorDict, expect=None):
    """ControlNetHED state dict → ControlNetHED flax params."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected = []
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "norm":
            flat[("norm",)] = v.reshape(1, 1, 1, 3)  # NCHW (1,3,1,1) → NHWC
            continue
        m = re.match(r"block(\d)\.convs\.(\d)\.(weight|bias)", k)
        if m:
            blk, i, leaf = m.groups()
            path = (f"block{blk}", f"convs_{i}")
        else:
            m = re.match(r"block(\d)\.projection\.(weight|bias)", k)
            if not m:
                unexpected.append(k)
                continue
            blk, leaf = m.groups()
            path = (f"block{blk}", "projection")
        if leaf == "weight":
            flat[path + ("kernel",)] = _conv_kernel(v)
        else:
            flat[path + ("bias",)] = v
    tree, missing = _assemble(flat, expect)
    return tree, missing, unexpected


def ingest_pidinet(sd: TensorDict, expect=None):
    """table5_pidinet state dict → PiDiNet flax params."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected = []
    for k, v in sd.items():
        k = k.replace("module.", "")
        v = np.asarray(v)
        leaf = k.rsplit(".", 1)[-1]

        def put(path, name=None):
            name = name or ("kernel" if leaf == "weight" else "bias")
            val = _conv_kernel(v) if (leaf == "weight" and v.ndim == 4) else v
            flat[tuple(path) + (name,)] = val

        if k.startswith("init_block."):
            put(("init_block",))
        elif re.match(r"block\d_\d\.", k):
            head, sub, _ = k.split(".", 2)
            put((head, sub))
        elif k.startswith("dilations."):
            _, idx, sub, _ = k.split(".")
            if sub == "conv1":
                put((f"dilations_{idx}", "conv1"))
            else:  # conv2_1..conv2_4 — bare kernels
                flat[(f"dilations_{idx}", f"{sub}_kernel")] = _conv_kernel(v)
        elif k.startswith("attentions."):
            _, idx, sub, _ = k.split(".")
            put((f"attentions_{idx}", sub))
        elif k.startswith("conv_reduces."):
            _, idx, _, _2 = (k.split(".") + [""])[:4]
            put((f"conv_reduces_{idx}",))
        elif k.startswith("classifier."):
            if leaf == "weight":
                flat[("classifier_kernel",)] = _conv_kernel(v)
            else:
                flat[("classifier_bias",)] = v
        else:
            unexpected.append(k)
    tree, missing = _assemble(flat, expect)
    return tree, missing, unexpected
