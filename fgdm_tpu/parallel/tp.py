"""Tensor-parallel parameter sharding rules for the UNet/transformer stack.

The reference has no TP (SURVEY §2.13); this is the TPU-native extension
point the survey calls for: a path→PartitionSpec rule table that shards the
big matmul weights over the mesh ``model`` axis.  With pjit, placing params
with these shardings is sufficient — XLA's SPMD partitioner propagates the
layouts through the forward/backward and inserts the all-reduces on ICI.

Megatron-style layout:
* attention ``to_q/to_k/to_v`` and MLP ``net_0``(GEGLU in) kernels — shard
  the **output** feature dim (column parallel; heads split across chips);
* attention ``to_out`` and MLP ``net_2`` kernels — shard the **input**
  feature dim (row parallel; psum after);
* conv kernels with many output channels — shard output channels;
* everything else (norms, biases, time embeddings) replicated.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_PARALLEL = ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1",
                # ResBlock time-emb projection (output pairs with the
                # channel-sharded conv activations) and the UNet time MLP
                "emb_proj", "time_embed_0", "time_embed_2")
ROW_PARALLEL = ("to_out", "out_proj", "fc2",
                "net_2")  # FF output projection (GEGLU pair of net_0)
COL_PARALLEL_GEGLU = ("net_0",)
MIN_SHARD_DIM = 256  # don't shard tiny tensors


def tp_spec(path: Tuple[str, ...], shape: Tuple[int, ...],
            n_model: int, min_shard_dim: int = MIN_SHARD_DIM) -> P:
    """PartitionSpec for one parameter."""
    if n_model <= 1 or not shape:
        return P()
    name_parts = set(path)
    leaf = path[-1]
    if leaf != "kernel":
        return P()
    if len(shape) == 2:
        in_dim, out_dim = shape
        if (name_parts & set(COL_PARALLEL + COL_PARALLEL_GEGLU)
                or any(p in COL_PARALLEL for p in path)):
            if out_dim % n_model == 0 and out_dim >= min_shard_dim:
                return P(None, "model")
        if name_parts & set(ROW_PARALLEL):
            if in_dim % n_model == 0 and in_dim >= min_shard_dim:
                return P("model", None)
        return P()
    if len(shape) == 4:  # conv HWIO: shard output channels
        out_ch = shape[-1]
        if out_ch % n_model == 0 and out_ch >= min_shard_dim:
            return P(None, None, None, "model")
        return P()
    return P()


def shard_params_tp(mesh: Mesh, params: Any,
                    min_shard_dim: int = MIN_SHARD_DIM) -> Any:
    """Place a param tree on the mesh with TP shardings (replicated over
    'data', split over 'model' per tp_spec)."""
    n_model = mesh.shape["model"]
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, value in flat.items():
        spec = tp_spec(_split_path(path), tuple(value.shape),
                       n_model, min_shard_dim)
        out[path] = jax.device_put(value, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)


def _split_path(path) -> Tuple[str, ...]:
    """Normalize paths whose elements may be '/'-joined strings (the
    TrainState partitions are flat dicts keyed that way)."""
    return tuple(p for el in path for p in str(el).split("/"))


def count_sharded(mesh: Mesh, params: Any,
                  min_shard_dim: int = MIN_SHARD_DIM) -> Tuple[int, int]:
    """(sharded_params, total_params) under the rule table — for tests."""
    n_model = mesh.shape["model"]
    flat = traverse_util.flatten_dict(params)
    sharded = sum(
        1 for path, v in flat.items()
        if tp_spec(_split_path(path), tuple(v.shape), n_model,
                   min_shard_dim) != P()
    )
    return sharded, len(flat)
