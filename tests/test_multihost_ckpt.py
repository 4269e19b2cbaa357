"""Multi-host orbax checkpoint IO: collective sharded SAVE and — the path
no other test exercises — collective sharded RESTORE.

Two jax.distributed processes (gloo, 4 virtual CPU devices each) hold one
8-device 'data' mesh with an FSDP-sharded TrainState (params + Adam
moments + EMA + step).  Phase "save": run one train step, save the
sharded state collectively (every host writes only its addressable
shards).  Phase "restore", in FRESH processes: build a deliberately
different state, restore the checkpoint into the live FSDP shardings
(every host reads only its shards — the per-host-IO restore path a
single-process test cannot reach), and train one more step.

The reference delegates all of this to Lightning's rank-zero ``.ckpt``
flow (`/root/reference/main.py:594-676`), which serializes the full state
through one host; the sharded orbax design is the at-scale redesign, and
this test is its multi-process evidence.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
pid, nproc, port, phase, ckdir = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4], sys.argv[5])
ndev = int(sys.argv[6]) if len(sys.argv) > 6 else 4
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                           process_id=pid)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, %(repo)r)
sys.path.insert(0, os.path.join(%(repo)r, "tests"))
from test_train import UNET_TINY, VAE_TINY, CLIP_TINY, _batch
from fgdm_tpu.checkpoint.orbax_io import CheckpointManager
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.parallel.fsdp import count_fsdp, shard_state_fsdp
from fgdm_tpu.parallel.mesh import (create_mesh, local_batch_slice,
                                    replicate, replicated, shard_batch)
from fgdm_tpu.train.state import (TrainState, adapter_filter, make_adamw,
                                  state_from_pytree, state_to_pytree)
from fgdm_tpu.train.train_step import make_train_step

ld = LatentDiffusion.create(UNetModel(**UNET_TINY), AutoencoderKL(**VAE_TINY),
                            CLIPTextEncoder(**CLIP_TINY),
                            jax.random.PRNGKey(0), latent_size=8)
mesh = create_mesh()  # all 8 global devices on 'data'
params = ld.unet_params
if phase == "restore":
    # deliberately different values: restore must overwrite every leaf
    params = jax.tree.map(lambda p: p + 0.5, params)
state = TrainState.create(params, make_adamw(1e-3),
                          trainable_filter=adapter_filter(), use_ema=True)
state = shard_state_fsdp(mesh, replicate(mesh, state), min_size=256)
ns, total, frac = count_fsdp(mesh, state, min_size=256)

rep = replicated(mesh)
checksum = jax.jit(
    lambda t: sum(jnp.sum(jnp.abs(v.astype(jnp.float32)))
                  for v in jax.tree.leaves(t)),
    out_shardings=rep)

step_fn = make_train_step(ld, mesh=mesh, infer_state_sharding=True)
batch = shard_batch(mesh, local_batch_slice(
    {k: np.asarray(v) for k, v in _batch(8).items()}))
mgr = CheckpointManager(ckdir, keep=2)

if phase == "save":
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2))
    mgr.save(0, state_to_pytree(state), force=True)
    mgr.wait()
    print(json.dumps({"rank": pid, "phase": phase,
                      "sharded_leaves": ns, "frac": round(frac, 4),
                      "loss": float(metrics["loss"]),
                      "checksum": float(checksum(state_to_pytree(state)))}),
          flush=True)
else:
    before = float(checksum(state_to_pytree(state)))
    target = state_to_pytree(state)  # live FSDP shardings = restore layout
    restored = mgr.restore(0, target=target)
    state = state_from_pytree(state, restored)
    after = float(checksum(state_to_pytree(state)))
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    print(json.dumps({"rank": pid, "phase": phase,
                      "checksum_before": before, "checksum": after,
                      "step": int(jax.device_get(state.step)),
                      "loss": float(metrics["loss"])}), flush=True)
mgr.close()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _run_phase(script, phase, ckdir, nproc=2, ndev=4):
    port = _free_port()
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={ndev}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc), str(port),
             phase, str(ckdir), str(ndev)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=REPO, text=True)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, \
            f"{phase} rank failed:\n{out}\n{err[-3000:]}"
        outs.append([json.loads(l) for l in out.splitlines()
                     if l.startswith("{")][-1])
    return outs


@pytest.mark.slow
def test_two_process_sharded_save_restore(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": REPO})
    ckdir = tmp_path / "ckpt"

    saves = _run_phase(script, "save", ckdir)
    # the state is genuinely FSDP-sharded and both ranks agree on the
    # global loss and the global checksum
    assert saves[0]["sharded_leaves"] > 0 and saves[0]["frac"] > 0.5
    assert saves[0]["loss"] == saves[1]["loss"]
    assert saves[0]["checksum"] == saves[1]["checksum"]

    restores = _run_phase(script, "restore", ckdir)
    for r in restores:
        # restore overwrote the perturbed state with the saved one
        assert r["checksum_before"] != pytest.approx(r["checksum"]), r
        np.testing.assert_allclose(r["checksum"], saves[0]["checksum"],
                                   rtol=1e-6)
        assert r["step"] == 2  # saved step 1 + one post-restore step
        assert np.isfinite(r["loss"])
    # both ranks computed the identical post-restore loss
    assert restores[0]["loss"] == restores[1]["loss"]

    # elastic resume: the same checkpoint restores into a DIFFERENT
    # process topology — 4 processes x 2 devices over the same 8-device
    # global mesh, so every host reads a different shard slice than any
    # writer wrote, and the global state must still be bit-identical
    elastic = _run_phase(script, "restore", ckdir, nproc=4, ndev=2)
    for r in elastic:
        np.testing.assert_allclose(r["checksum"], saves[0]["checksum"],
                                   rtol=1e-6)
        assert r["step"] == 2
    assert len({r["loss"] for r in elastic}) == 1
    # same global batch + same restored state + same rng => the 4x2 run's
    # post-restore loss equals the 2x4 run's
    np.testing.assert_allclose(elastic[0]["loss"], restores[0]["loss"],
                               rtol=2e-4)
