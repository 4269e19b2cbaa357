"""Flax param-tree → torch state-dict export (the ingester's inverse).

Lets checkpoints trained in this framework be consumed by the PyTorch
reference (same key schema as `/root/reference` models; see torch_ingest.py)
and powers round-trip tests of the mapping.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
from flax import traverse_util

TensorDict = Dict[str, np.ndarray]

_RES_INV = {
    "in_norm": "in_layers.0",
    "in_conv": "in_layers.2",
    "emb_proj": "emb_layers.1",
    "out_norm": "out_layers.0",
    "out_conv": "out_layers.3",
    "skip_connection": "skip_connection",
}


def _leaf_to_torch(leaf: str, v: np.ndarray) -> Tuple[str, np.ndarray]:
    if leaf == "kernel":
        if v.ndim == 4:
            return "weight", np.transpose(v, (3, 2, 0, 1))  # HWIO → OIHW
        return "weight", np.transpose(v)
    if leaf == "scale":
        return "weight", v
    if leaf == "bias":
        return "bias", v
    if leaf == "embedding":
        return "weight", v
    raise ValueError(f"unknown leaf {leaf}")


def _transformer_inner(parts: List[str]) -> str:
    inner = ".".join(parts)
    m = re.match(r"transformer_blocks_(\d+)\.(.*)", inner)
    if m:
        d, rest = m.groups()
        rest = rest.replace("ff.net_0.proj", "ff.net.0.proj")
        rest = rest.replace("ff.net_2", "ff.net.2")
        rest = rest.replace("to_out", "to_out.0")
        return f"transformer_blocks.{d}.{rest}"
    return inner


def _unet_path_to_torch(path: Tuple[str, ...]) -> Optional[str]:
    head, rest = path[0], list(path[1:])
    m = re.match(r"time_embed_(\d+)$", head)
    if m:
        return f"time_embed.{m.group(1)}"
    if head == "out_norm":
        return "out.0"
    if head == "out_conv":
        return "out.2"
    if head == "adapter":
        if not rest:
            return None
        if rest[0] == "conv_in":
            return "adapter.conv_in"
        m = re.match(r"body_(\d+)$", rest[0])
        if m:
            sub = rest[1] if len(rest) > 1 else ""
            sub = _RES_INV.get(sub, sub)
            return f"adapter.body.{m.group(1)}.{sub}"
        return None
    m = re.match(r"(input|output)_blocks_(\d+)_(\d+)$", head)
    if m:
        stage, i, j = m.groups()
        base = f"{stage}_blocks.{i}.{j}"
        if not rest:
            return base  # bare conv (input_blocks.0.0)
        if rest[0] in ("op", "conv"):
            return f"{base}.{rest[0]}"
        if rest[0] in _RES_INV:
            return f"{base}.{_RES_INV[rest[0]]}"
        return f"{base}.{_transformer_inner(rest)}"
    m = re.match(r"middle_block_(\d+)$", head)
    if m:
        base = f"middle_block.{m.group(1)}"
        if rest and rest[0] in _RES_INV:
            return f"{base}.{_RES_INV[rest[0]]}"
        return f"{base}.{_transformer_inner(rest)}"
    if head == "label_emb":
        return "label_emb"
    return None


def _controlnet_path_to_torch(path: Tuple[str, ...]) -> Optional[str]:
    head = path[0]
    m = re.match(r"zero_convs_(\d+)$", head)
    if m:
        return f"zero_convs.{m.group(1)}.0"
    if head == "middle_block_out":
        return "middle_block_out.0"
    m = re.match(r"input_hint_block_(\d+)$", head)
    if m:
        return f"input_hint_block.{int(m.group(1)) * 2}"
    return _unet_path_to_torch(path)


def _vae_path_to_torch(path: Tuple[str, ...]) -> Optional[str]:
    head = path[0]
    if head in ("quant_conv", "post_quant_conv"):
        return head
    if head in ("encoder", "decoder"):
        sub = path[1]
        inner = ".".join(path[2:])
        if sub in ("conv_in", "conv_out", "norm_out"):
            return f"{head}.{sub}"
        m = re.match(r"mid_(block_1|attn_1|block_2)$", sub)
        if m:
            return f"{head}.mid.{m.group(1)}.{inner}"
        m = re.match(r"(down|up)_(\d+)_(block|attn)_(\d+)$", sub)
        if m:
            dr, lvl, kind, j = m.groups()
            return f"{head}.{dr}.{lvl}.{kind}.{j}.{inner}"
        m = re.match(r"down_(\d+)_downsample$", sub)
        if m:
            return f"{head}.down.{m.group(1)}.downsample.conv"
        m = re.match(r"up_(\d+)_upsample$", sub)
        if m:
            return f"{head}.up.{m.group(1)}.upsample.conv"
    return None


def _clip_path_to_torch(path: Tuple[str, ...], leaf: str) -> Optional[str]:
    if leaf == "position_embedding":
        return "text_model.embeddings.position_embedding"
    head = path[0] if path else ""
    if head == "token_embedding":
        return "text_model.embeddings.token_embedding"
    if head == "final_layer_norm":
        return "text_model.final_layer_norm"
    m = re.match(r"layers_(\d+)$", head)
    if m:
        inner = list(path[1:])
        if inner and inner[0] in ("fc1", "fc2"):
            inner = ["mlp"] + inner
        return f"text_model.encoder.layers.{m.group(1)}." + ".".join(inner)
    return None


def _export(params: Any, path_fn, prefix: str, clip_mode=False) -> TensorDict:
    tree = params.get("params", params) if isinstance(params, dict) else params
    flat = traverse_util.flatten_dict(tree)
    out: TensorDict = {}
    for path, v in flat.items():
        leaf = path[-1]
        v = np.asarray(v)
        if clip_mode:
            tpath = _clip_path_to_torch(tuple(path[:-1]) or (leaf,), leaf)
            if tpath is None:
                continue
            if leaf in ("embedding", "position_embedding"):
                out[f"{prefix}{tpath}.weight"] = v
                continue
        else:
            tpath = path_fn(tuple(path[:-1]))
            if tpath is None:
                continue
        tleaf, tv = _leaf_to_torch(leaf, v)
        out[f"{prefix}{tpath}.{tleaf}"] = tv
    return out


def export_unet(params, prefix="model.diffusion_model.") -> TensorDict:
    return _export(params, _unet_path_to_torch, prefix)


def export_controlnet(params, prefix="control_model.") -> TensorDict:
    return _export(params, _controlnet_path_to_torch, prefix)


def export_vae(params, prefix="first_stage_model.") -> TensorDict:
    return _export(params, _vae_path_to_torch, prefix)


def export_clip(params, prefix="cond_stage_model.transformer.") -> TensorDict:
    return _export(params, None, prefix, clip_mode=True)
