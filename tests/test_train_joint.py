"""Joint-factor (AdaptDiffusion) training recipe, exercised end-to-end.

Covers `/root/reference/ldm/models/diffusion/ddpm.py:1851-1927`: 8-channel
joint latents, eps loss on the image half only, and joint-image-adapter-only
optimization (`:1866-1870`) — on synthetic data, on a DP mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.core.schedules import DiffusionSchedule
from fgdm_tpu.models.seq_two_unet import SeqTwoUNet
from fgdm_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from fgdm_tpu.train.joint import make_joint_train_step
from fgdm_tpu.train.state import (
    TrainState,
    joint_image_adapter_filter,
    make_adamw,
    partition_params,
)

TINY = dict(model_channels=32, num_heads=4, context_dim=64,
            channel_mult=(1, 2), attention_resolutions=(1, 2),
            num_res_blocks=1, dtype=jnp.float32)


@pytest.fixture(scope="module")
def joint_model():
    model = SeqTwoUNet(**TINY, factor_channels=4, mapped_channels=4,
                       image_adapter=True)
    x = jnp.zeros((1, 16, 16, 8))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 64))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    # Adapter-only training presumes a *pretrained* backbone: with the
    # scratch-init zero head conv, the frozen backbone would block all
    # adapter gradients.  Randomize zero-init kernels (as test_unet.py does)
    # to simulate loaded SD weights.
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: (
            jax.random.normal(jax.random.PRNGKey(hash(str(path)) % 2**31),
                              p.shape, p.dtype) * 0.02
            if np.all(np.asarray(p) == 0) and p.ndim >= 2
            else p
        ),
        params,
    )
    return model, params


def _batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "latent": jnp.asarray(
            rng.standard_normal((b, 16, 16, 8)), jnp.float32),
        "context": jnp.asarray(
            rng.standard_normal((b, 77, 64)), jnp.float32) * 0.02,
    }


def test_image_adapter_mode_builds_adapter(joint_model):
    from flax import traverse_util
    _, params = joint_model
    paths = set(traverse_util.flatten_dict(params, sep="/"))
    assert any("unet1/adapter" in p for p in paths)
    # adapter consumes the 4-ch mapped condition, not an 8-ch concat
    assert not any("unet2/adapter" in p for p in paths)


def test_joint_partition(joint_model):
    _, params = joint_model
    train, frozen = partition_params(params, joint_image_adapter_filter())
    assert train and frozen
    assert all("unet1/adapter" in k or "channel_mapper" in k for k in train)
    n_train = sum(int(np.prod(v.shape)) for v in train.values())
    n_frozen = sum(int(np.prod(v.shape)) for v in frozen.values())
    assert n_train < n_frozen  # backbones dominate and stay frozen


def test_joint_training_learns_and_freezes_backbone(joint_model):
    model, params = joint_model
    sched = DiffusionSchedule.create(1000, "linear",
                                     linear_start=0.00085, linear_end=0.0120)
    tx = make_adamw(1e-3)
    state = TrainState.create(params, tx,
                              trainable_filter=joint_image_adapter_filter())
    frozen_before = jax.tree.map(np.asarray, state.frozen)

    step = make_joint_train_step(model, sched)
    # fixed rng = fixed (t, noise): repeated steps optimize one deterministic
    # objective, so the loss must strictly decrease
    sub = jax.random.PRNGKey(42)
    losses = []
    for i in range(4):
        state, metrics = step(state, _batch(seed=0), sub)
        losses.append(float(metrics["train/loss"]))
        assert np.isfinite(losses[-1])
        assert float(metrics["grad_norm"]) > 0.0
    # repeated steps on the same batch must reduce the loss
    assert losses[-1] < losses[0]
    # frozen partition is bit-identical after training
    for k, v in state.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), frozen_before[k])


def test_joint_training_on_mesh(joint_model):
    model, params = joint_model
    sched = DiffusionSchedule.create(1000, "linear",
                                     linear_start=0.00085, linear_end=0.0120)
    mesh = create_mesh(n_data=len(jax.devices()))
    state = TrainState.create(params, make_adamw(1e-3),
                              trainable_filter=joint_image_adapter_filter())
    state = replicate(mesh, state)
    step = make_joint_train_step(model, sched, mesh=mesh)
    batch = shard_batch(mesh, _batch(b=8))
    rng = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["train/loss"]))
