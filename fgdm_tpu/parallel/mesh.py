"""Device mesh + sharding rules — the framework's parallelism layer.

The reference's only strategy is PyTorch-Lightning DDP over NCCL
(`/root/reference/main.py:546,691-698`).  The TPU-native equivalent is a
``jax.sharding.Mesh`` over ICI with named axes:

* ``data``  — batch sharding (the DP baseline; gradient psum over ICI is
  inserted by the compiler from the sharding annotations).
* ``model`` — reserved tensor-parallel axis: attention heads / conv channels
  can be sharded here without touching model code (XLA propagates).

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``;
the mesh spans all global devices and DCN handles the inter-slice edges.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up: call before the first backend touch.

    Initializes ``jax.distributed`` when a cluster is declared through the
    standard env (``JAX_COORDINATOR_ADDRESS`` [+ ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``]) or when running under a TPU pod runtime that
    auto-detects (``FGDM_DISTRIBUTED=1`` forces the call).  A no-op
    otherwise, so single-host runs never risk a coordinator hang.  Returns
    True when initialization ran.  After this, ``create_mesh`` spans all
    global devices and DCN carries the inter-slice mesh edges.
    """
    import os

    want = (os.environ.get("FGDM_DISTRIBUTED", "0") == "1"
            or "JAX_COORDINATOR_ADDRESS" in os.environ)
    if not want:
        return False
    kw = {}
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        kw["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
    if "JAX_NUM_PROCESSES" in os.environ:
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "JAX_PROCESS_ID" in os.environ:
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    return True


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs: [B, ...] split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree onto the mesh, batch-sharded.

    Multi-host: ``batch`` must be this process's contiguous slice of the
    global batch (``global_bs / process_count`` rows, the rows its
    addressable devices own under the 'data' sharding); the global array is
    assembled from every host's shards without cross-host copies."""
    s = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, x), batch)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def local_batch_slice(batch):
    """This process's contiguous rows of a host batch that is identical on
    every host (e.g. a seed-deterministic val batch) — the slice
    ``shard_batch`` expects on a multi-host mesh.  No-op single-host."""
    pc, pi = jax.process_count(), jax.process_index()
    if pc == 1:
        return batch

    def f(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        n = x.shape[0]
        assert n % pc == 0, f"batch dim {n} must divide over {pc} hosts"
        k = n // pc
        return x[pi * k:(pi + 1) * k]

    return jax.tree.map(f, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params, opt state) across the mesh.

    Multi-host: every process must hold the SAME host values (seeded init
    or a checkpoint restore gives this); each host then feeds its
    addressable replicas without cross-host traffic."""
    r = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(r, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
