"""Fuzzy ingest assistant tests — recovers an exact mapping on a model
whose schema we do know (HED), and reports gaps honestly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from fgdm_tpu.annotators.hed import ControlNetHED
from fgdm_tpu.checkpoint.fuzzy_ingest import apply_mapping, match_state_dict


@pytest.fixture(scope="module")
def hed_pair():
    hed = ControlNetHED()
    params = hed.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(p.size % 101), p.shape),
        params)
    # synthesize the torch-style state dict (known schema)
    sd = {}
    flat = traverse_util.flatten_dict(params["params"])
    for path, v in flat.items():
        v = np.asarray(v)
        if path == ("norm",):
            sd["norm"] = v.reshape(1, 3, 1, 1)
            continue
        blk, sub, leaf = path
        tleaf = "weight" if leaf == "kernel" else "bias"
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)
        if sub.startswith("convs_"):
            sd[f"{blk}.convs.{sub[-1]}.{tleaf}"] = v
        else:
            sd[f"{blk}.projection.{tleaf}"] = v
    return hed, params, sd


def test_fuzzy_matches_hed_fully(hed_pair):
    hed, params, sd = hed_pair
    mapping, un_t, un_f = match_state_dict(sd, params)
    # the (1,3,1,1) norm param has no flax 4D twin (stored (1,1,1,3)) —
    # everything else must match
    assert len(un_t) <= 1
    assert all("norm" in k for k in un_t)
    tree = apply_mapping(sd, mapping, params)
    got = traverse_util.flatten_dict(tree["params"], sep="/")
    exp = traverse_util.flatten_dict(params["params"], sep="/")
    mismatches = [k for k in exp
                  if "norm" not in k and
                  not np.allclose(np.asarray(got[k]), np.asarray(exp[k]))]
    assert not mismatches, mismatches[:5]


def test_fuzzy_reports_unmatched():
    expect = {"params": {"a": {"kernel": jnp.zeros((3, 3, 4, 8))}}}
    sd = {"something.weight": np.zeros((8, 4, 3, 3)),
          "orphan.weight": np.zeros((99, 99))}
    mapping, un_t, un_f = match_state_dict(sd, expect)
    assert mapping == {"something.weight": "a/kernel"}
    assert un_t == ["orphan.weight"]
    assert un_f == []
