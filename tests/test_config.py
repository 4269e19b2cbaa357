"""Config system tests — including parsing the reference's own YAML files."""

import jax.numpy as jnp
import pytest

from fgdm_tpu.builders import ModelSpec
from fgdm_tpu.config import (
    apply_dot_overrides,
    instantiate_from_config,
    load_config,
    merge_configs,
)

REF_CONFIG = "/root/reference/models/config.yaml"
REF_TRAIN_CONFIG = (
    "/root/reference/configs/stable-diffusion/"
    "nautilus_coco_adapter_semantic_map_gt_captions_distill_loss.yaml"
)


def test_merge_and_overrides():
    a = {"model": {"params": {"lr": 1, "keep": True}}}
    b = {"model": {"params": {"lr": 2}}}
    m = merge_configs(a, b)
    assert m["model"]["params"] == {"lr": 2, "keep": True}
    o = apply_dot_overrides(m, ["model.params.lr=3", "new.flag=true"])
    assert o["model"]["params"]["lr"] == 3
    assert o["new"]["flag"] is True
    assert m["model"]["params"]["lr"] == 2  # original untouched


def test_dotless_scientific_floats_coerce():
    # PyYAML's stock resolver yields *strings* for "5e-5" (no dot before
    # the exponent) — the most common learning-rate spelling.  OmegaConf
    # coerces these in the reference (main.py:539-541); so must we, in
    # both dot-overrides and config files.
    o = apply_dot_overrides({}, [
        "model.base_learning_rate=5e-5",
        "a.int=3", "a.float=1.5", "a.exp=2E8", "a.str=1e5th", "a.name=x",
    ])
    assert o["model"]["base_learning_rate"] == 5e-5
    assert isinstance(o["model"]["base_learning_rate"], float)
    assert o["a"] == {"int": 3, "float": 1.5, "exp": 2e8,
                      "str": "1e5th", "name": "x"}

    import tempfile

    from fgdm_tpu.config import load_config

    with tempfile.NamedTemporaryFile("w", suffix=".yaml") as f:
        f.write("model:\n  base_learning_rate: 1e-6\n  tag: v1e5\n")
        f.flush()
        cfg = load_config(f.name)
    assert cfg["model"]["base_learning_rate"] == 1e-6
    assert cfg["model"]["tag"] == "v1e5"


def test_reference_inference_config_parses():
    """The reference's shipped models/config.yaml must instantiate into our
    ModelSpec with the SD-1.4 geometry."""
    cfg = load_config(REF_CONFIG)
    spec = instantiate_from_config(cfg["model"], dtype=jnp.float32)
    assert isinstance(spec, ModelSpec)
    u = spec.unet_def
    assert u.model_channels == 320
    assert tuple(u.channel_mult) == (1, 2, 4, 4)
    assert u.context_dim == 768
    assert u.num_heads == 8
    assert spec.scale_factor == pytest.approx(0.18215)
    assert spec.schedule_args["linear_start"] == pytest.approx(0.00085)
    assert spec.schedule_args["linear_end"] == pytest.approx(0.0120)
    assert spec.freeze_backbone is True
    assert spec.apply_distill_loss is True
    assert spec.distill_every_n_step == 10
    assert spec.vae_def.ch == 128
    assert spec.clip_def is not None
    sched = spec.schedule()
    assert sched.num_timesteps == 1000


def test_reference_train_config_parses():
    cfg = load_config(REF_TRAIN_CONFIG)
    spec = instantiate_from_config(cfg["model"], dtype=jnp.float32)
    assert isinstance(spec, ModelSpec)
    assert cfg["model"]["base_learning_rate"] == pytest.approx(1.0e-5)
    # data section resolves through the alias table too (not executed here —
    # needs a real data dir — but the target must be known)
    from fgdm_tpu.config import TARGET_ALIASES

    assert cfg["data"]["params"]["train"]["target"] in TARGET_ALIASES


def test_time_adapter_config():
    cfg = load_config(
        "/root/reference/configs/stable-diffusion/"
        "nautilus_coco_adapter_semantic_map_gt_captions_time_adapter.yaml"
    )
    spec = instantiate_from_config(cfg["model"], dtype=jnp.float32)
    assert spec.unet_def.use_time_adapter is True


def test_tiny_spec_create():
    spec = instantiate_from_config(
        {
            "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
            "params": {
                "image_size": 8,
                "scale_factor": 0.18215,
                "unet_config": {
                    "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                    "params": {
                        "model_channels": 32, "num_heads": 4,
                        "context_dim": 64, "channel_mult": [1, 2],
                        "attention_resolutions": [1, 2], "num_res_blocks": 1,
                    },
                },
                "first_stage_config": {
                    "target": "ldm.models.autoencoder.AutoencoderKL",
                    "params": {"embed_dim": 4, "ddconfig": {
                        "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "resolution": 64, "z_channels": 4, "double_z": True,
                        "in_channels": 3, "out_ch": 3, "attn_resolutions": [],
                    }},
                },
                "cond_stage_config": "__is_unconditional__",
            },
        },
        dtype=jnp.float32,
    )
    import jax

    ld = spec.create(jax.random.PRNGKey(0))
    assert ld.unet_params is not None and ld.vae_params is not None
    assert ld.clip_params is None


def test_unknown_target_raises():
    with pytest.raises((ImportError, ModuleNotFoundError, AttributeError)):
        instantiate_from_config({"target": "no.such.module.Thing"})
