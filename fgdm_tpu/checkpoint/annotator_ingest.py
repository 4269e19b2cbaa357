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


_BN_LEAF = {"weight": "scale", "bias": "bias", "running_mean": "mean",
            "running_var": "var"}


def _bn(flat, path: Tuple[str, ...], leaf: str, v: np.ndarray) -> bool:
    """Route a torch BatchNorm leaf into a FrozenBatchNorm subtree."""
    if leaf == "num_batches_tracked":
        return True
    if leaf in _BN_LEAF:
        flat[path + (_BN_LEAF[leaf],)] = v
        return True
    return False


def ingest_mlsd(sd: TensorDict, expect=None):
    """mlsd_large_512_fp32 state dict → MobileV2MLSDLarge flax params.

    Key schema from the reference module itself
    (`/root/reference/controlnet/annotator/mlsd/models/mbv2_mlsd_large.py`):
    ``backbone.features.N.conv.*`` InvertedResiduals (features.1 has no
    expand stage), ``block{15..22}.conv{1,2}.{0,1}`` TypeA/B heads,
    ``block23.conv{1,2,3}`` TypeC.  Oracle-tested against the instantiated
    torch module (tests/test_annotator_oracle.py).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected: List[str] = []
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if parts[0] == "backbone" and parts[1] == "features":
            n = int(parts[2])
            base = ("backbone", f"features_{n}")
            if n == 0:
                # ConvBNReLU stem: 0.0 conv, 0.1 bn
                if parts[3] == "0" and leaf == "weight":
                    flat[base + ("kernel",)] = _conv_kernel(v)
                elif parts[3] == "1" and _bn(flat, base + ("bn",), leaf, v):
                    pass
                else:
                    unexpected.append(k)
                continue
            # InvertedResidual: backbone.features.N.conv.<i>...
            if parts[3] != "conv":
                unexpected.append(k)
                continue
            i = int(parts[4])
            rest = parts[5:]
            has_expand = n != 1
            if has_expand:
                stages = {0: "expand", 1: "depthwise", 2: "project",
                          3: "project_bn"}
            else:
                stages = {0: "depthwise", 1: "project", 2: "project_bn"}
            stage = stages.get(i)
            if stage is None:
                unexpected.append(k)
            elif stage in ("expand", "depthwise"):
                # nested ConvBNReLU: .0 conv, .1 bn
                if rest[0] == "0" and leaf == "weight":
                    flat[base + (stage, "kernel")] = _conv_kernel(v)
                elif rest[0] == "1" and _bn(flat, base + (stage, "bn"),
                                            leaf, v):
                    pass
                else:
                    unexpected.append(k)
            elif stage == "project" and leaf == "weight":
                flat[base + ("project", "kernel")] = _conv_kernel(v)
            elif stage == "project_bn" and _bn(flat, base + ("project_bn",),
                                               leaf, v):
                pass
            else:
                unexpected.append(k)
            continue
        m = re.match(r"block(\d+)\.conv(\d)\.(\d)\.(.*)", k)
        if m:
            blk, ci, si, tail = int(m.group(1)), m.group(2), m.group(3), \
                m.group(4)
            base = (f"block{blk}",)
            if blk in (15, 17, 19, 21):          # BlockTypeA
                sub = (f"conv{ci}_conv",) if si == "0" \
                    else (f"conv{ci}_bn",)
            elif blk in (16, 18, 20, 22):        # BlockTypeB
                sub = (f"conv{ci}",) if si == "0" else (f"bn{ci}",)
            elif blk == 23:                      # BlockTypeC conv1/conv2
                if ci == "1" and si == "0":
                    # bare-kernel dilated conv
                    if tail == "weight":
                        flat[base + ("conv1_kernel",)] = _conv_kernel(v)
                    elif tail == "bias":
                        flat[base + ("conv1_bias",)] = v
                    else:
                        unexpected.append(k)
                    continue
                sub = (f"conv{ci}",) if si == "0" else (f"bn{ci}",)
            else:
                unexpected.append(k)
                continue
            if si == "0":
                if tail == "weight":
                    flat[base + sub + ("kernel",)] = _conv_kernel(v)
                elif tail == "bias":
                    flat[base + sub + ("bias",)] = v
                else:
                    unexpected.append(k)
            elif not _bn(flat, base + sub, tail, v):
                unexpected.append(k)
            continue
        m = re.match(r"block23\.conv3\.(weight|bias)", k)
        if m:
            if m.group(1) == "weight":
                flat[("block23", "conv3", "kernel")] = _conv_kernel(v)
            else:
                flat[("block23", "conv3", "bias")] = v
            continue
        unexpected.append(k)
    tree, missing = _assemble(flat, expect)
    return tree, missing, unexpected


def _uniformer_backbone_key(parts: List[str], leaf: str, v: np.ndarray,
                            flat, unexpected, k: str) -> None:
    """Map one backbone.* torch key (uniformer.py module names)."""
    ln = {"weight": "scale", "bias": "bias"}
    if parts[0].startswith("patch_embed"):
        base = (parts[0],)
        if parts[1] == "norm":
            flat[base + ("norm", ln[leaf])] = v
        elif parts[1] == "proj":
            flat[base + ("proj", "kernel" if leaf == "weight" else "bias")] \
                = _conv_kernel(v) if leaf == "weight" else v
        else:
            unexpected.append(k)
        return
    m = re.match(r"blocks(\d)", parts[0])
    if m:
        stage = int(m.group(1))
        base = (f"blocks{stage}_{parts[1]}",)
        sub = parts[2]
        if sub == "pos_embed":
            flat[base + (f"pos_embed_{'kernel' if leaf == 'weight' else 'bias'}",)] \
                = _conv_kernel(v) if leaf == "weight" else v
        elif sub in ("norm1", "norm2"):
            if stage <= 2:                       # CBlock: BatchNorm2d
                _bn(flat, base + (sub,), leaf, v)
            else:                                # SABlock: LayerNorm
                flat[base + (sub, ln[leaf])] = v
        elif sub == "conv1" or sub == "conv2":   # CBlock 1×1 convs
            flat[base + (sub, "kernel" if leaf == "weight" else "bias")] \
                = _conv_kernel(v) if leaf == "weight" else v
        elif sub == "attn" and stage <= 2:       # CBlock dw 5×5
            flat[base + (f"attn_{'kernel' if leaf == 'weight' else 'bias'}",)] \
                = _conv_kernel(v) if leaf == "weight" else v
        elif sub == "attn":                      # SABlock qkv/proj Linears
            name = parts[3]
            flat[base + (name, "kernel" if leaf == "weight" else "bias")] \
                = _linear_kernel(v) if leaf == "weight" else v
        elif sub == "mlp":
            name = f"mlp_{parts[3]}"
            if stage <= 2:                       # CMlp: 1×1 convs
                val = _conv_kernel(v) if leaf == "weight" else v
            else:                                # Mlp: Linears
                val = _linear_kernel(v) if leaf == "weight" else v
            flat[base + (name, "kernel" if leaf == "weight" else "bias")] = val
        else:
            unexpected.append(k)
        return
    m = re.match(r"norm(\d)$", parts[0])
    if m:
        flat[(parts[0], ln[leaf])] = v
        return
    unexpected.append(k)


def _uniformer_head_key(parts: List[str], leaf: str, v: np.ndarray,
                        flat, unexpected, k: str) -> None:
    """Map one decode_head.* torch key (mmseg UPerHead module names)."""

    def put_conv(base: Tuple[str, ...], sub: str):
        if sub == "conv":
            if leaf == "weight":
                flat[base + ("conv", "kernel")] = _conv_kernel(v)
            else:
                unexpected.append(k)
        elif sub == "bn":
            if not _bn(flat, base + ("bn",), leaf, v):
                unexpected.append(k)
        else:
            unexpected.append(k)

    if parts[0] == "conv_seg":
        flat[("conv_seg", "kernel" if leaf == "weight" else "bias")] \
            = _conv_kernel(v) if leaf == "weight" else v
    elif parts[0] == "psp_modules":
        # Sequential(AdaptiveAvgPool2d, ConvModule) — ConvModule is .1
        put_conv((f"ppm_{parts[1]}",), parts[3])
    elif parts[0] == "bottleneck":
        put_conv(("bottleneck",), parts[1])
    elif parts[0] == "lateral_convs":
        put_conv((f"lateral_{parts[1]}",), parts[2])
    elif parts[0] == "fpn_convs":
        put_conv((f"fpn_{parts[1]}",), parts[2])
    elif parts[0] == "fpn_bottleneck":
        put_conv(("fpn_bottleneck",), parts[1])
    else:
        unexpected.append(k)


def ingest_uniformer(sd: TensorDict, expect=None):
    """upernet_global_small state dict → UniFormerSeg flax params.

    Handles the full-segmentor schema (``backbone.*`` + ``decode_head.*``;
    ``auxiliary_head.*`` is inference-dead and skipped), per the reference
    module definitions in
    `/root/reference/controlnet/annotator/uniformer/mmseg/models/`
    (backbones/uniformer.py, decode_heads/uper_head.py).  Oracle-tested
    against the instantiated torch modules."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected: List[str] = []
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        leaf = parts[-1]
        if leaf == "num_batches_tracked" or parts[0] == "auxiliary_head":
            continue
        if parts[0] == "backbone":
            sub: Dict[Tuple[str, ...], np.ndarray] = {}
            _uniformer_backbone_key(parts[1:], leaf, v, sub, unexpected, k)
            for kk, vv in sub.items():
                flat[("backbone",) + kk] = vv
        elif parts[0] == "decode_head":
            sub = {}
            _uniformer_head_key(parts[1:], leaf, v, sub, unexpected, k)
            for kk, vv in sub.items():
                flat[("decode_head",) + kk] = vv
        else:
            unexpected.append(k)
    tree, missing = _assemble(flat, expect)
    return tree, missing, unexpected


def _resize_pos_embed(pe: np.ndarray, n_tokens: int) -> np.ndarray:
    """Bilinear-resize the ViT pos-embed grid to a new token count, keeping
    the cls slot (reference vit.py:_resize_pos_embed semantics)."""
    if pe.shape[1] == n_tokens:
        return pe
    cls_pe, grid = pe[:, :1], pe[:, 1:]
    g_old = int(round(float(grid.shape[1]) ** 0.5))
    g_new = int(round(float(n_tokens - 1) ** 0.5))
    import jax
    import jax.numpy as jnp

    grid = grid.reshape(1, g_old, g_old, -1)
    # antialias=False: the reference resizes with F.interpolate(bilinear),
    # which never antialiases — jax.image.resize would on downscale
    grid = np.asarray(jax.image.resize(
        jnp.asarray(grid), (1, g_new, g_new, grid.shape[-1]), "bilinear",
        antialias=False))
    return np.concatenate([cls_pe, grid.reshape(1, g_new * g_new, -1)],
                          axis=1)


def ingest_midas(sd: TensorDict, expect=None):
    """dpt_hybrid-midas state dict → DPTHybrid flax params.

    Key schema per the reference module code that loads the released
    checkpoint (`/root/reference/controlnet/annotator/midas/midas/
    {vit,blocks,dpt_depth}.py` + timm's vit_base_resnet50_384 naming):
    ``pretrained.model.*`` hybrid backbone, ``pretrained.act_postprocess*``
    reassemble convs, ``scratch.*`` refinement decoder.  The unused final
    ViT norm is skipped; pos_embed is grid-resized to the target token
    count."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected: List[str] = []
    ln = {"weight": "scale", "bias": "bias"}
    exp_flat = (traverse_util.flatten_dict(expect, sep="/")
                if expect is not None else {})
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        leaf = parts[-1]
        if k == "pretrained.model.cls_token":
            flat[("cls_token",)] = v
        elif k == "pretrained.model.pos_embed":
            want = exp_flat.get("params/pos_embed")
            flat[("pos_embed",)] = (
                _resize_pos_embed(v, want.shape[1]) if want is not None
                else v)
        elif k.startswith("pretrained.model.norm."):
            # final ViT norm: never consumed (taps fire at block outputs)
            continue
        elif k.startswith("pretrained.model.patch_embed.backbone.stem."):
            if parts[5] == "conv" and leaf == "weight":
                flat[("resnet", "conv_stem", "kernel")] = _conv_kernel(v)
            elif parts[5] == "norm":
                flat[("resnet", "gn_stem", ln[leaf])] = v
            else:
                unexpected.append(k)
        elif k.startswith("pretrained.model.patch_embed.backbone.stages."):
            s, _, i = int(parts[5]), parts[6], parts[7]
            base = ("resnet", f"stage{s + 1}_{i}")
            sub = parts[8]
            if sub.startswith("norm"):
                flat[base + (f"gn{sub[-1]}", ln[leaf])] = v
            elif sub.startswith("conv") and leaf == "weight":
                flat[base + (sub, "kernel")] = _conv_kernel(v)
            elif sub == "downsample" and parts[9] == "conv" \
                    and leaf == "weight":
                flat[base + ("downsample", "kernel")] = _conv_kernel(v)
            elif sub == "downsample" and parts[9] == "norm":
                # post-norm bottleneck shortcut norm (timm Bottleneck /
                # DownsampleConv, apply_act=False)
                flat[base + ("downsample_norm", ln[leaf])] = v
            else:
                unexpected.append(k)
        elif k.startswith("pretrained.model.patch_embed.proj."):
            flat[("patch_embed", "kernel" if leaf == "weight" else "bias")] \
                = _conv_kernel(v) if leaf == "weight" else v
        elif k.startswith("pretrained.model.blocks."):
            i = parts[3]
            base = (f"blocks_{i}",)
            sub = parts[4]
            if sub in ("norm1", "norm2"):
                flat[base + (sub, ln[leaf])] = v
            elif sub == "attn":
                flat[base + (parts[5], "kernel" if leaf == "weight"
                             else "bias")] \
                    = _linear_kernel(v) if leaf == "weight" else v
            elif sub == "mlp":
                flat[base + (parts[5], "kernel" if leaf == "weight"
                             else "bias")] \
                    = _linear_kernel(v) if leaf == "weight" else v
            else:
                unexpected.append(k)
        elif re.match(r"pretrained\.act_postprocess([34])\.0\.project\.0\.",
                      k):
            n = k.split(".")[1][-1]
            flat[(f"readout{n}", "kernel" if leaf == "weight" else "bias")] \
                = _linear_kernel(v) if leaf == "weight" else v
        elif re.match(r"pretrained\.act_postprocess([34])\.3\.", k):
            n = k.split(".")[1][-1]
            flat[(f"act_postprocess{n}_proj",
                  "kernel" if leaf == "weight" else "bias")] \
                = _conv_kernel(v) if leaf == "weight" else v
        elif k.startswith("pretrained.act_postprocess4.4."):
            flat[("act_postprocess4", "kernel" if leaf == "weight"
                  else "bias")] = _conv_kernel(v) if leaf == "weight" else v
        elif re.match(r"scratch\.layer(\d)_rn\.weight", k):
            flat[(parts[1], "kernel")] = _conv_kernel(v)
        elif k.startswith("scratch.refinenet"):
            rn = parts[1]
            sub = parts[2]
            if sub == "out_conv":
                flat[(rn, "out_conv", "kernel" if leaf == "weight"
                      else "bias")] = _conv_kernel(v) if leaf == "weight" \
                    else v
            elif sub.startswith("resConfUnit"):
                flat[(rn, sub, parts[3], "kernel" if leaf == "weight"
                      else "bias")] = _conv_kernel(v) if leaf == "weight" \
                    else v
            else:
                unexpected.append(k)
        elif k.startswith("scratch.output_conv."):
            idx = {"0": "head_conv1", "2": "head_conv2", "4": "head_conv3"}
            name = idx.get(parts[2])
            if name is None:
                unexpected.append(k)
            else:
                flat[(name, "kernel" if leaf == "weight" else "bias")] \
                    = _conv_kernel(v) if leaf == "weight" else v
        else:
            unexpected.append(k)
    tree, missing = _assemble(flat, expect)
    return tree, missing, unexpected


def ingest_openpose(sd: TensorDict, expect=None):
    """body_pose_model checkpoint → BodyPoseNet flax params.

    The RELEASED ``body_pose_model.pth`` stores BARE conv names
    (``conv1_1.weight``, ``Mconv1_stage2_L1.weight``) — the reference
    re-prefixes them onto module paths at load time
    (`openpose/util.py:30-34` ``transfer``).  A ``state_dict()`` export of
    the torch module instead carries ``model{s}_{L}.`` prefixes
    (`openpose/model.py:24-142`).  Both forms are accepted: any leading
    ``model*`` component is stripped, then the bare name alone determines
    the location (stage/limb are encoded in the conv names)."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected: List[str] = []
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if re.fullmatch(r"model\d(?:_\d)?", parts[0]):
            parts = parts[1:]
        if len(parts) != 2 or parts[1] not in ("weight", "bias"):
            unexpected.append(k)
            continue
        conv, leaf = parts
        m = re.fullmatch(r"Mconv\d+_stage(\d)_L(\d)", conv)
        m1 = re.fullmatch(r"conv5_\d_CPM_L(\d)", conv)
        if m:
            path = (f"stage{m.group(1)}_L{m.group(2)}", conv)
        elif m1:
            path = (f"stage1_L{m1.group(1)}", conv)
        else:
            path = (conv,)
        if leaf == "weight":
            flat[path + ("kernel",)] = _conv_kernel(v)
        else:
            flat[path + ("bias",)] = v
    tree, missing = _assemble(flat, expect)
    return tree, missing, unexpected


def ingest_handpose(sd: TensorDict, expect=None):
    """hand_pose_model checkpoint → HandPoseNet flax params.

    Same dual-form contract as :func:`ingest_openpose` (the released file
    is bare-named, a ``state_dict()`` export is ``model1_0/model1_1/
    model{2..6}``-prefixed; schema `openpose/model.py:143-216`): the stem
    and conv6_* heads sit at the top level, ``Mconv{j}_stage{s}`` under
    ``stage{s}``."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}
    unexpected: List[str] = []
    for k, v in sd.items():
        v = np.asarray(v)
        parts = k.split(".")
        if re.fullmatch(r"model\d(?:_\d)?", parts[0]):
            parts = parts[1:]
        if len(parts) != 2 or parts[1] not in ("weight", "bias"):
            unexpected.append(k)
            continue
        conv, leaf = parts
        m = re.fullmatch(r"Mconv\d+_stage(\d)", conv)
        path = (f"stage{m.group(1)}", conv) if m else (conv,)
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
