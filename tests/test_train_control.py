"""ControlNet fine-tuning step: sd_locked partitioning + mesh smoke
(reference cldm.py:924-931 optimizer policy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.control import ControlLDM
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.controlnet import ControlNet
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from fgdm_tpu.train.control import (control_filter, control_param_tree,
                                    make_control_train_step)
from fgdm_tpu.train.state import TrainState, make_adamw, partition_params

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, use_adapter=False, dtype=jnp.float32)
CN_TINY = dict(in_channels=4, model_channels=32, hint_channels=3,
               num_res_blocks=1, attention_resolutions=(1, 2),
               channel_mult=(1, 2), num_heads=4, context_dim=64,
               dtype=jnp.float32)
VAE_TINY = dict(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                resolution=64, z_channels=4, embed_dim=4, dtype=jnp.float32)
CLIP_TINY = dict(vocab_size=128, embed_dim=64, num_layers=2, num_heads=4)


@pytest.fixture(scope="module")
def tiny_cldm():
    cldm = ControlLDM.create_control(
        UNetModel(**UNET_TINY), AutoencoderKL(**VAE_TINY),
        CLIPTextEncoder(**CLIP_TINY), ControlNet(**CN_TINY),
        jax.random.PRNGKey(0), latent_size=8,
        control_scales=(1.0,) * 5)
    # perturb the zero-init heads (UNet out_conv, ControlNet zero convs) so
    # gradients flow back into the control branch
    rng = np.random.default_rng(7)
    perturb = lambda p: p + jnp.asarray(
        rng.standard_normal(p.shape).astype(np.float32) * 0.02)
    return cldm.replace(unet_params=jax.tree.map(perturb, cldm.unet_params),
                        control_params=jax.tree.map(
                            perturb, cldm.control_params))


def _batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.uniform(-1, 1, (b, 64, 64, 3)), jnp.float32),
        "hint": jnp.asarray(rng.uniform(0, 1, (b, 64, 64, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, 128, (b, 77)), jnp.int32),
    }


def test_control_filter_sd_locked(tiny_cldm):
    tree = control_param_tree(tiny_cldm)
    train, frozen = partition_params(tree, control_filter(sd_locked=True))
    assert train and frozen
    assert all(k.startswith("control/") for k in train)
    # every control param is trainable
    assert not any(k.startswith("control/") for k in frozen)


def test_control_filter_unlocked_adds_decoder(tiny_cldm):
    tree = control_param_tree(tiny_cldm)
    train, _ = partition_params(tree, control_filter(sd_locked=False))
    assert any("output_blocks_" in k for k in train)
    assert any("out_conv" in k for k in train)
    # encoder stays frozen even unlocked
    assert not any("input_blocks_" in k and k.startswith("unet/")
                   for k in train)


def test_control_train_step_mesh(tiny_cldm):
    """Mesh-sharded smoke: control params update, UNet/VAE/CLIP bit-frozen."""
    mesh = create_mesh(n_data=8)
    tx = make_adamw(1e-3)
    state = TrainState.create(control_param_tree(tiny_cldm), tx,
                              trainable_filter=control_filter(sd_locked=True))
    before_train = jax.tree.map(np.asarray, state.params)
    before_frozen = jax.tree.map(np.asarray, state.frozen)
    vae_before = jax.tree.map(np.asarray, tiny_cldm.vae_params)
    clip_before = jax.tree.map(np.asarray, tiny_cldm.clip_params)
    state = replicate(mesh, state)

    step = make_control_train_step(tiny_cldm, mesh=mesh)
    batch = shard_batch(mesh, _batch())
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0

    moved = 0
    for k, v in state.params.items():
        if not np.array_equal(np.asarray(v), before_train[k]):
            moved += 1
    assert moved > 0, "no control param moved"
    for k, v in state.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), before_frozen[k])
    # VAE/CLIP aren't even in the optimizer tree
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 tiny_cldm.vae_params, vae_before)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 tiny_cldm.clip_params, clip_before)
