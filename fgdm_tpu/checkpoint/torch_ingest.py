"""Torch state-dict → flax param-tree ingestion.

The de-facto interface of the reference is its checkpoint key schema
(`/root/reference/scripts/txt2img_fgdm_inference.py:23-38` loads
``models/fgdm_seg.pth`` with ``strict=False``;
`controlnet/initialize_cn.py:25-41` loads ``fgdm_control_sd15_*.pth``).  This
module maps those keys onto our NHWC flax trees:

* ``model.diffusion_model.*``      → UNet (+ FG-DM ``adapter.*``)
* ``first_stage_model.*``          → AutoencoderKL
* ``cond_stage_model.transformer.*`` → CLIP text tower
* ``control_model.*``              → ControlNet branch

Weight-layout rules: conv OIHW→HWIO, linear [out,in]→[in,out]ᵀ, norm
``weight``→``scale``.  Missing/unexpected keys are reported, mirroring the
reference's ``strict=False`` surgery (`ddpm.py:244-270`), and ``ignore_keys``
/ ``replace_keys`` prefix surgery is supported.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from flax import traverse_util

TensorDict = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# Loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> TensorDict:
    """Load a .pth/.ckpt/.safetensors file into numpy arrays (CPU torch)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def apply_key_surgery(
    sd: TensorDict,
    ignore_keys: Sequence[str] = (),
    replace_keys: Sequence[Tuple[str, str]] = (),
) -> TensorDict:
    """Prefix drop/rename, as in reference ``init_from_ckpt``
    (ddpm.py:244-263)."""
    out = {}
    for k, v in sd.items():
        if any(k.startswith(ik) for ik in ignore_keys):
            continue
        for old, new in replace_keys:
            if old in k:
                k = k.replace(old, new)
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# Leaf-level converters
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW → HWIO


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)  # [out,in] → [in,out]


def _convert_module_params(
    tkey_suffix: str, value: np.ndarray
) -> Optional[Tuple[str, np.ndarray]]:
    """Map a torch param-name suffix to (flax leaf name, converted value).

    Dispatch on tensor rank: 4D = conv, 2D = linear, 1D = bias/norm.
    """
    name = tkey_suffix
    if name == "weight":
        if value.ndim == 4:
            return "kernel", _conv_kernel(value)
        if value.ndim == 3:
            # conv1d [out, in, 1] (pixel-attn qkv/proj_out,
            # openaimodel.py:331,339) → dense [in, out]
            return "kernel", np.transpose(value[:, :, 0])
        if value.ndim == 2:
            return "kernel", _linear_kernel(value)
        if value.ndim == 1:
            return "scale", value  # norm weight
    if name == "bias":
        return "bias", value
    return None


# ---------------------------------------------------------------------------
# UNet key mapping
# ---------------------------------------------------------------------------

_RES_MAP = {
    "in_layers.0": "in_norm",
    "in_layers.2": "in_conv",
    "emb_layers.1": "emb_proj",
    "out_layers.0": "out_norm",
    "out_layers.3": "out_conv",
    "skip_connection": "skip_connection",
}


def _map_resblock(rest: str) -> Optional[List[str]]:
    for tpref, ours in _RES_MAP.items():
        if rest.startswith(tpref + "."):
            return [ours]
    return None


def _map_transformer(rest: str) -> Optional[List[str]]:
    """SpatialTransformer inner paths (torch names already match ours except
    dots→nesting and ff.net index naming)."""
    m = re.match(r"transformer_blocks\.(\d+)\.(.*)", rest)
    if m:
        d, inner = m.groups()
        inner = inner.replace("to_out.0", "to_out")
        inner = inner.replace("ff.net.0.proj", "ff.net_0.proj")
        inner = inner.replace("ff.net.2", "ff.net_2")
        parts = inner.split(".")[:-1]
        return [f"transformer_blocks_{d}"] + parts
    # norm/proj shared by SpatialTransformer and the legacy pixel-attention
    # block; "qkv" exists only on the latter (openaimodel.py:331)
    for p in ("norm", "proj_in", "proj_out", "qkv"):
        if rest.startswith(p + "."):
            return [p]
    return None


def _map_adapter(rest: str) -> Optional[List[str]]:
    if rest.startswith("conv_in."):
        return ["adapter", "conv_in"]
    m = re.match(r"body\.(\d+)\.(.*)", rest)
    if m:
        idx, inner = m.groups()
        head = inner.split(".")[0]
        sub = {
            "in_conv": "in_conv", "block1": "block1", "block2": "block2",
            "skep": "skep", "down_opt": "down_opt",
        }.get(head)
        if sub is None:
            # TimeAdapter body blocks are UNet ResBlocks
            res = _map_resblock(inner)
            if res is None:
                return None
            return ["adapter", f"body_{idx}"] + res
        return ["adapter", f"body_{idx}", sub]
    return None


def map_unet_key(tkey: str) -> Optional[List[str]]:
    """torch 'model.diffusion_model.'-relative key → flax path (sans leaf)."""
    if tkey.startswith("adapter."):
        return _map_adapter(tkey[len("adapter."):])
    m = re.match(r"time_embed\.(\d+)\.", tkey)
    if m:
        return [f"time_embed_{m.group(1)}"]
    m = re.match(r"(input|output)_blocks\.(\d+)\.(\d+)\.(.*)", tkey)
    if m:
        stage, i, j, rest = m.groups()
        base = f"{stage}_blocks_{i}_{j}"
        if rest.startswith("op."):          # Downsample conv
            return [base, "op"]
        if rest.startswith("conv."):        # Upsample conv
            return [base, "conv"]
        if rest == "weight" or rest == "bias":  # bare conv (input_blocks.0.0)
            return [base]
        res = _map_resblock(rest)
        if res is not None:
            return [base] + res
        tr = _map_transformer(rest)
        if tr is not None:
            return [base] + tr
        return None
    m = re.match(r"middle_block\.(\d+)\.(.*)", tkey)
    if m:
        j, rest = m.groups()
        base = f"middle_block_{j}"
        res = _map_resblock(rest)
        if res is not None:
            return [base] + res
        tr = _map_transformer(rest)
        if tr is not None:
            return [base] + tr
        return None
    m = re.match(r"out\.(\d+)\.", tkey)
    if m:
        return ["out_norm" if m.group(1) == "0" else "out_conv"]
    if tkey.startswith("label_emb."):
        return ["label_emb"]
    return None


# ---------------------------------------------------------------------------
# ControlNet key mapping
# ---------------------------------------------------------------------------

def map_controlnet_key(tkey: str) -> Optional[List[str]]:
    m = re.match(r"zero_convs\.(\d+)\.0\.", tkey)
    if m:
        return [f"zero_convs_{m.group(1)}"]
    if tkey.startswith("middle_block_out.0."):
        return ["middle_block_out"]
    m = re.match(r"input_hint_block\.(\d+)\.", tkey)
    if m:
        # torch Sequential indices 0,2,4,...,14 (convs interleaved with SiLU)
        return [f"input_hint_block_{int(m.group(1)) // 2}"]
    return map_unet_key(tkey)


# ---------------------------------------------------------------------------
# VAE key mapping
# ---------------------------------------------------------------------------

def map_vae_key(tkey: str) -> Optional[List[str]]:
    for stage in ("encoder", "decoder"):
        if not tkey.startswith(stage + "."):
            continue
        rest = tkey[len(stage) + 1:]
        if rest.startswith("conv_in."):
            return [stage, "conv_in"]
        if rest.startswith("conv_out."):
            return [stage, "conv_out"]
        if rest.startswith("norm_out."):
            return [stage, "norm_out"]
        m = re.match(r"mid\.(block_1|attn_1|block_2)\.(\w+)\.", rest)
        if m:
            blk, sub = m.groups()
            return [stage, f"mid_{blk}", sub]
        m = re.match(r"(down|up)\.(\d+)\.(block|attn)\.(\d+)\.(\w+)\.", rest)
        if m:
            dr, lvl, kind, j, sub = m.groups()
            kind = {"block": "block", "attn": "attn"}[kind]
            return [stage, f"{dr}_{lvl}_{kind}_{j}", sub]
        m = re.match(r"(down)\.(\d+)\.downsample\.conv\.", rest)
        if m:
            return [stage, f"down_{m.group(2)}_downsample", "conv"]
        m = re.match(r"(up)\.(\d+)\.upsample\.conv\.", rest)
        if m:
            return [stage, f"up_{m.group(2)}_upsample", "conv"]
        return None
    if tkey.startswith("quant_conv."):
        return ["quant_conv"]
    if tkey.startswith("post_quant_conv."):
        return ["post_quant_conv"]
    return None


# ---------------------------------------------------------------------------
# CLIP key mapping
# ---------------------------------------------------------------------------

def map_clip_key(tkey: str) -> Optional[Tuple[List[str], Optional[str]]]:
    """HF CLIPTextModel key → (flax path, leaf-override).

    Returns leaf-override for embedding tables (no transpose)."""
    t = tkey
    if t.startswith("text_model."):
        t = t[len("text_model."):]
    if t == "embeddings.token_embedding.weight":
        return ["token_embedding"], "embedding"
    if t == "embeddings.position_embedding.weight":
        return [], "position_embedding"
    if t.startswith("final_layer_norm."):
        return ["final_layer_norm"], None
    m = re.match(
        r"encoder\.layers\.(\d+)\.(self_attn\.(?:q|k|v|out)_proj|layer_norm1|"
        r"layer_norm2|mlp\.fc1|mlp\.fc2)\.", t
    )
    if m:
        i, inner = m.groups()
        parts = inner.replace("mlp.", "").split(".")
        return [f"layers_{i}"] + parts, None
    return None


# ---------------------------------------------------------------------------
# Tree assembly
# ---------------------------------------------------------------------------

def _assemble(
    sd: TensorDict,
    mapper,
    expect: Optional[Any] = None,
    verbose: bool = True,
    clip_mode: bool = False,
) -> Tuple[Any, List[str], List[str]]:
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected: List[str] = []
    for tkey, value in sd.items():
        mapped = mapper(tkey)
        if mapped is None:
            unexpected.append(tkey)
            continue
        if clip_mode:
            path, leaf_override = mapped
            if leaf_override is not None:
                flat[tuple(path) + (leaf_override,)] = np.asarray(value)
                continue
        else:
            path = mapped
        suffix = tkey.rsplit(".", 1)[-1]
        conv = _convert_module_params(suffix, np.asarray(value))
        if conv is None:
            unexpected.append(tkey)
            continue
        leaf, cval = conv
        flat[tuple(path) + (leaf,)] = cval
    params = traverse_util.unflatten_dict(flat)
    tree = {"params": params}

    missing: List[str] = []
    if expect is not None:
        exp_flat = traverse_util.flatten_dict(expect, sep="/")
        got_flat = traverse_util.flatten_dict(tree, sep="/")
        for k, v in exp_flat.items():
            if k not in got_flat:
                missing.append(k)
            elif tuple(got_flat[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {k}: ckpt {got_flat[k].shape} vs "
                    f"model {v.shape}"
                )
        # fill missing from the expected tree (strict=False semantics)
        for k in missing:
            got_flat[k] = np.asarray(exp_flat[k])
        extra = [k for k in got_flat if k not in exp_flat]
        for k in extra:
            del got_flat[k]
        tree = traverse_util.unflatten_dict(got_flat, sep="/")
    if verbose and (missing or unexpected):
        print(f"[torch_ingest] missing: {len(missing)} unexpected: {len(unexpected)}")
    return tree, missing, unexpected


def ingest_unet(sd: TensorDict, expect=None, prefix="model.diffusion_model."):
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return _assemble(sub, map_unet_key, expect)


def ingest_controlnet(sd: TensorDict, expect=None, prefix="control_model."):
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return _assemble(sub, map_controlnet_key, expect)


def ingest_vae(sd: TensorDict, expect=None, prefix="first_stage_model."):
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return _assemble(sub, map_vae_key, expect)


def ingest_clip(sd: TensorDict, expect=None,
                prefix="cond_stage_model.transformer."):
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return _assemble(sub, map_clip_key, expect, clip_mode=True)
