"""Checkpoint mapping tests: torch↔flax round trip, layout numerics, and
key-schema spot checks against the reference state-dict naming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fgdm_tpu.checkpoint import torch_export as te
from fgdm_tpu.checkpoint import torch_ingest as ti
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.controlnet import ControlNet
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.nn.layers import Conv2d, Dense

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)


def _rand_tree(params, seed=0):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), l.dtype) for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _trees_equal(a, b):
    ok = jax.tree.map(lambda x, y: bool(np.allclose(np.asarray(x), np.asarray(y))), a, b)
    return all(jax.tree.leaves(ok))


def test_conv_layout_matches_torch():
    """Our HWIO conv on NHWC must equal torch OIHW conv on NCHW after the
    ingester's transposition."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.standard_normal((8,)).astype(np.float32)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)  # NCHW

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w))
        tconv.bias.copy_(torch.from_numpy(b))
        ref = tconv(torch.from_numpy(x)).numpy()

    conv = Conv2d(features=8, kernel_size=3)
    params = {"params": {"kernel": jnp.asarray(ti._conv_kernel(w)),
                         "bias": jnp.asarray(b)}}
    ours = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


def test_linear_layout_matches_torch():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((5, 7)).astype(np.float32)  # [out, in]
    b = rng.standard_normal((5,)).astype(np.float32)
    x = rng.standard_normal((3, 7)).astype(np.float32)
    ref = x @ w.T + b
    dense = Dense(features=5)
    params = {"params": {"kernel": jnp.asarray(ti._linear_kernel(w)),
                         "bias": jnp.asarray(b)}}
    np.testing.assert_allclose(np.asarray(dense.apply(params, jnp.asarray(x))),
                               ref, atol=1e-5)


def test_unet_roundtrip():
    unet = UNetModel(**UNET_TINY)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 64)))
    params = _rand_tree(params)
    sd = te.export_unet(params)
    assert all(k.startswith("model.diffusion_model.") for k in sd)
    # reference-schema spot checks
    assert "model.diffusion_model.input_blocks.0.0.weight" in sd
    assert "model.diffusion_model.time_embed.0.weight" in sd
    assert "model.diffusion_model.out.2.weight" in sd
    assert "model.diffusion_model.adapter.conv_in.weight" in sd
    assert any("in_layers.2.weight" in k for k in sd)
    assert any("transformer_blocks.0.attn1.to_q.weight" in k for k in sd)
    assert any("ff.net.0.proj.weight" in k for k in sd)
    back, missing, unexpected = ti.ingest_unet(sd, expect=params)
    assert not missing and not unexpected
    assert _trees_equal(params, back)


def test_vae_roundtrip():
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        resolution=32, attn_resolutions=(16,), dtype=jnp.float32)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                      sample_posterior=False)
    params = _rand_tree(params)
    sd = te.export_vae(params)
    assert "first_stage_model.encoder.conv_in.weight" in sd
    assert "first_stage_model.decoder.mid.attn_1.q.weight" in sd
    assert "first_stage_model.quant_conv.weight" in sd
    assert any("down.0.block.0.norm1.weight" in k for k in sd)
    assert any("downsample.conv.weight" in k for k in sd)
    back, missing, unexpected = ti.ingest_vae(sd, expect=params)
    assert not missing and not unexpected
    assert _trees_equal(params, back)


def test_clip_roundtrip():
    clip = CLIPTextEncoder(vocab_size=128, embed_dim=64, num_layers=2,
                           num_heads=4)
    params = clip.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    params = _rand_tree(params)
    sd = te.export_clip(params)
    assert "cond_stage_model.transformer.text_model.embeddings.token_embedding.weight" in sd
    assert "cond_stage_model.transformer.text_model.encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "cond_stage_model.transformer.text_model.encoder.layers.0.mlp.fc1.weight" in sd
    assert "cond_stage_model.transformer.text_model.final_layer_norm.weight" in sd
    back, missing, unexpected = ti.ingest_clip(sd, expect=params)
    assert not missing and not unexpected
    assert _trees_equal(params, back)


def test_controlnet_roundtrip():
    cn = ControlNet(model_channels=32, num_heads=4, context_dim=64,
                    channel_mult=(1, 2), attention_resolutions=(1, 2),
                    num_res_blocks=1, dtype=jnp.float32)
    params = cn.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                     jnp.zeros((1, 128, 128, 3)), jnp.zeros((1,), jnp.int32),
                     jnp.zeros((1, 77, 64)))
    params = _rand_tree(params)
    sd = te.export_controlnet(params)
    assert "control_model.zero_convs.0.0.weight" in sd
    assert "control_model.middle_block_out.0.weight" in sd
    assert "control_model.input_hint_block.0.weight" in sd
    assert "control_model.input_hint_block.14.weight" in sd
    back, missing, unexpected = ti.ingest_controlnet(sd, expect=params)
    assert not missing and not unexpected
    assert _trees_equal(params, back)


def test_strict_false_semantics():
    """Missing keys fall back to the init tree; extra ckpt keys dropped —
    mirroring the reference's strict=False loads."""
    unet = UNetModel(**UNET_TINY)
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 64)))
    sd = te.export_unet(_rand_tree(params))
    # adapter-only checkpoint (like fgdm_seg.pth without SD backbone)
    sd_adapter = {k: v for k, v in sd.items() if ".adapter." in k}
    sd_adapter["model.diffusion_model.bogus.weight"] = np.zeros((3, 3))
    back, missing, unexpected = ti.ingest_unet(sd_adapter, expect=params)
    assert missing and unexpected == ["bogus.weight"]
    flat = jax.tree.leaves(back)
    assert all(l is not None for l in flat)


def test_key_surgery():
    sd = {"model_ema.x": np.zeros(1), "model.old_name.weight": np.zeros(1)}
    out = ti.apply_key_surgery(sd, ignore_keys=("model_ema.",),
                               replace_keys=(("old_name", "new_name"),))
    assert list(out) == ["model.new_name.weight"]


def test_load_torch_state_dict_safetensors(tmp_path):
    """The .safetensors branch of the universal loader."""
    safetensors = pytest.importorskip("safetensors.numpy")

    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    d = {"a.weight": np.ones((2, 3), np.float32),
         "b.bias": np.zeros((4,), np.float16)}
    p = str(tmp_path / "x.safetensors")
    safetensors.save_file(d, p)
    out = load_torch_state_dict(p)
    assert set(out) == set(d)
    np.testing.assert_array_equal(out["a.weight"], d["a.weight"])
    assert out["b.bias"].dtype == np.float16
