"""On-the-fly condition synthesis in the training path (ddpm.py:137-150,
397-419): kind mapping, target math, and an end-to-end sketch train smoke."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.train.condition import (ConditionSynth, build_condition_synth,
                                      condition_kind)
from fgdm_tpu.train.state import TrainState, adapter_filter, make_adamw
from fgdm_tpu.train.train_step import _encode_target, make_train_step

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)
VAE_TINY = dict(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                resolution=64, z_channels=4, embed_dim=4, dtype=jnp.float32)
CLIP_TINY = dict(vocab_size=128, embed_dim=64, num_layers=2, num_heads=4)


class _TinyDepth(nn.Module):
    """Stand-in depth net (DPT-hybrid is too big for CPU tests): a learned
    channel blend, non-negative like the real head."""

    @nn.compact
    def __call__(self, x):
        w = self.param("w", nn.initializers.ones, (3,), jnp.float32)
        return jax.nn.relu(jnp.einsum("bhwc,c->bhw", x, w))


@pytest.fixture(scope="module")
def tiny_ld():
    rng = jax.random.PRNGKey(0)
    return LatentDiffusion.create(
        UNetModel(**UNET_TINY), AutoencoderKL(**VAE_TINY),
        CLIPTextEncoder(**CLIP_TINY), rng, latent_size=8)


def _img(b=2, hw=64):
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, 3)), jnp.float32)


def test_condition_kind_mapping():
    # the 8 reference training configs (configs/stable-diffusion/*.yaml)
    assert condition_kind() is None                                # seg
    assert condition_kind(use_depth=True) == "depth"
    assert condition_kind(use_depth=True, use_normal=True) == "normal"
    assert condition_kind(use_sketch=True) == "sketch"             # pidinet
    assert condition_kind(use_sketch=True, use_hed=True) == "sketch_hed"
    assert condition_kind(sketch_to_normal=True) == "sketch_to_normal"


def test_depth_target_range_and_shape():
    img = _img()
    model = _TinyDepth()
    synth = ConditionSynth(kind="depth", model_def=model,
                           params=model.init(jax.random.PRNGKey(0), img))
    tgt = synth.target(img)
    assert tgt.shape == img.shape
    # min-max normalized per image then mapped to [-1,1]
    assert float(tgt.min()) >= -1.0 - 1e-6 and float(tgt.max()) <= 1.0 + 1e-6
    np.testing.assert_allclose(float(tgt.min()), -1.0, atol=1e-5)
    np.testing.assert_allclose(float(tgt.max()), 1.0, atol=1e-5)
    # grayscale replicated to 3 channels
    np.testing.assert_array_equal(np.asarray(tgt[..., 0]),
                                  np.asarray(tgt[..., 2]))


def test_normal_target_unit_vectors():
    img = _img()
    model = _TinyDepth()
    synth = ConditionSynth(kind="normal", model_def=model,
                           params=model.init(jax.random.PRNGKey(0), img))
    tgt = synth.target(img)
    assert tgt.shape == img.shape
    norms = np.linalg.norm(np.asarray(tgt), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_sketch_synth_pidinet():
    synth = build_condition_synth("sketch", rng=jax.random.PRNGKey(0),
                                  image_size=64)
    tgt = synth.target(_img())
    assert tgt.shape == (2, 64, 64, 3)
    # binarized edges: values in {-1, +1}
    vals = np.unique(np.asarray(tgt))
    assert set(vals).issubset({-1.0, 1.0})


def test_sketch_to_normal_encode_splits(tiny_ld):
    img = _img()
    model = _TinyDepth()
    sk = build_condition_synth("sketch", rng=jax.random.PRNGKey(0),
                               image_size=64)
    synth = ConditionSynth(kind="sketch_to_normal", model_def=model,
                           params=model.init(jax.random.PRNGKey(0), img),
                           model_def2=sk.model_def, params2=sk.params)
    tgt = synth.target(img)
    assert tgt.shape == (2, 64, 64, 6)
    z = _encode_target(tiny_ld, {"image": img}, synth, jax.random.PRNGKey(1))
    assert z.shape == (2, 8, 8, 8)  # two 4-ch latent groups concatenated


def test_train_step_with_condition(tiny_ld):
    """Depth-config train smoke: loss finite, only adapter params move, the
    frozen annotator is untouched (it lives outside the TrainState)."""
    img = _img(b=4)
    model = _TinyDepth()
    ann_params = model.init(jax.random.PRNGKey(0), img)
    synth = ConditionSynth(kind="depth", model_def=model, params=ann_params)
    ann_before = jax.tree.map(np.asarray, ann_params)

    tx = make_adamw(1e-3)
    state = TrainState.create(tiny_ld.unet_params, tx,
                              trainable_filter=adapter_filter())
    frozen_before = jax.tree.map(np.asarray, state.frozen)
    step = make_train_step(tiny_ld, condition=synth)
    batch = {"image": img,
             "input_ids": jnp.zeros((4, 77), jnp.int32)}
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    # backbone bit-frozen
    for k, v in state.frozen.items():
        np.testing.assert_array_equal(np.asarray(v), frozen_before[k])
    # annotator params bit-frozen (never part of the optimizer state)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
                 synth.params, ann_before)


def test_reference_configs_expose_condition_kind():
    """The 4 non-seg reference training configs instantiate and map to the
    right synthesis kind."""
    import os

    from fgdm_tpu.config import instantiate_from_config, load_config

    base = "/root/reference/configs/stable-diffusion"
    if not os.path.isdir(base):
        pytest.skip("reference configs unavailable")
    expected = {
        "nautilus_coco_adapter_depth_map_gt_captions_distill_loss.yaml":
            "depth",
        "nautilus_coco_adapter_normal_map_gt_captions_distill_loss.yaml":
            "normal",
        "nautilus_coco_adapter_sketch_map_gt_captions_distill_loss.yaml":
            "sketch",
        "nautilus_coco_adapter_semantic_map_gt_captions_distill_loss.yaml":
            None,
    }
    for name, kind in expected.items():
        cfg = load_config(os.path.join(base, name))
        spec = instantiate_from_config(cfg["model"])
        assert spec.condition_kind() == kind, name
