"""Annotator checkpoint ingest tests (synthetic torch state dicts)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.annotators.hed import ControlNetHED
from fgdm_tpu.annotators.pidinet import PiDiNet
from fgdm_tpu.checkpoint.annotator_ingest import ingest_hed, ingest_pidinet
from flax import traverse_util


def _tree_to_torch_sd(params, path_to_key):
    """Build a synthetic torch state dict from a flax tree via an inverse
    path mapping (values transposed back to torch layouts)."""
    flat = traverse_util.flatten_dict(params["params"])
    sd = {}
    for path, v in flat.items():
        key = path_to_key(path)
        if key is None:
            continue
        v = np.asarray(v)
        if path[-1] == "kernel" and v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO → OIHW
        sd[key] = v
    return sd


def test_hed_ingest_roundtrip():
    hed = ControlNetHED()
    x = jnp.zeros((1, 32, 32, 3))
    params = hed.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(p.size % 97), p.shape),
        params)

    def inv(path):
        if path == ("norm",):
            return "norm"
        blk = path[0].replace("block", "block")
        if path[1].startswith("convs_"):
            return f"{blk}.convs.{path[1][-1]}.{'weight' if path[-1]=='kernel' else 'bias'}"
        if path[1] == "projection":
            return f"{blk}.projection.{'weight' if path[-1]=='kernel' else 'bias'}"
        return None

    sd = _tree_to_torch_sd(params, inv)
    sd["norm"] = np.asarray(params["params"]["norm"]).reshape(1, 3, 1, 1)
    tree, missing, unexpected = ingest_hed(sd, expect=params)
    assert not missing and not unexpected
    ok = jax.tree.map(lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
                      tree, params)
    assert all(jax.tree.leaves(ok))


def test_pidinet_ingest_roundtrip():
    net = PiDiNet(inplane=12, dil=8)
    x = jnp.zeros((1, 32, 32, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(p.size % 89), p.shape),
        params)

    def inv(path):
        head = path[0]
        leaf = "weight" if path[-1].endswith("kernel") else "bias"
        if head == "init_block":
            return f"module.init_block.{leaf}"
        if re.match(r"block\d_\d", head):
            return f"module.{head}.{path[1]}.{leaf}"
        if head.startswith("dilations_"):
            idx = head.split("_")[1]
            sub = path[1] if len(path) > 2 else path[1]
            if path[-1].startswith("conv2_"):
                return f"module.dilations.{idx}.{path[-1][:-7]}.weight"
            return f"module.dilations.{idx}.{path[1]}.{leaf}"
        if head.startswith("attentions_"):
            idx = head.split("_")[1]
            return f"module.attentions.{idx}.{path[1]}.{leaf}"
        if head.startswith("conv_reduces_"):
            idx = head.split("_")[2]
            return f"module.conv_reduces.{idx}.conv.{leaf}"
        if head == "classifier_kernel":
            return "module.classifier.weight"
        if head == "classifier_bias":
            return "module.classifier.bias"
        return None

    sd = _tree_to_torch_sd(params, inv)
    # classifier kernel path is a bare param, transpose manually
    sd["module.classifier.weight"] = np.asarray(
        params["params"]["classifier_kernel"]).transpose(3, 2, 0, 1)
    # CDCM bare kernels as well
    for k in list(params["params"]):
        if k.startswith("dilations_"):
            for sub, v in params["params"][k].items():
                if sub.startswith("conv2_"):
                    idx = k.split("_")[1]
                    sd[f"module.dilations.{idx}.{sub[:-7]}.weight"] = \
                        np.asarray(v).transpose(3, 2, 0, 1)
    tree, missing, unexpected = ingest_pidinet(sd, expect=params)
    assert not missing, missing[:5]
    assert not unexpected, unexpected[:5]
    ok = jax.tree.map(lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b))),
                      tree, params)
    assert all(jax.tree.leaves(ok))
