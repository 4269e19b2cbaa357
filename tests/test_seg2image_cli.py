"""seg2image CLI + cldm-config parsing tests.

The reference drives this flow through a gradio app
(`/root/reference/controlnet/seg2image_inference.py:43-142`) built from
`controlnet/models/cldm_v15_canny.yaml`; here the yaml instantiates into a
ControlSpec and the CLI renders a directory of maps end to end.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from fgdm_tpu.builders import ControlSpec
from fgdm_tpu.config import instantiate_from_config, load_config

REF_CLDM = "/root/reference/controlnet/models/cldm_v15_canny.yaml"


@pytest.mark.skipif(not os.path.exists(REF_CLDM), reason="reference absent")
def test_reference_cldm_config_parses():
    """The reference's shipped ControlNet yaml instantiates unchanged."""
    spec = instantiate_from_config(load_config(REF_CLDM)["model"],
                                   dtype=jnp.float32)
    assert isinstance(spec, ControlSpec)
    assert spec.unet_def.model_channels == 320
    assert not spec.unet_def.use_adapter          # ControlledUnetModel
    assert spec.cn_def.hint_channels == 3
    assert spec.cn_def.model_channels == 320
    assert tuple(spec.cn_def.channel_mult) == (1, 2, 4, 4)
    assert spec.scale_factor == 0.18215
    assert spec.image_size == 64
    assert spec.only_mid_control is False
    assert spec.schedule_args["linear_start"] == 0.00085


def _tiny_cldm_yaml(root):
    unet_p = {
        "model_channels": 32, "num_heads": 4, "context_dim": 64,
        "channel_mult": [1, 2], "attention_resolutions": [1, 2],
        "num_res_blocks": 1,
    }
    cfg = {"model": {
        "target": "cldm.cldm.ControlLDM",
        "params": {
            "image_size": 8,
            "scale_factor": 0.18215,
            "linear_start": 0.00085, "linear_end": 0.0120,
            "only_mid_control": False,
            "unet_config": {
                "target": "cldm.cldm.ControlledUnetModel",
                "params": unet_p,
            },
            "control_stage_config": {
                "target": "cldm.cldm.ControlNet",
                "params": {**unet_p, "hint_channels": 3},
            },
            "first_stage_config": {
                "target": "ldm.models.autoencoder.AutoencoderKL",
                "params": {"embed_dim": 4, "ddconfig": {
                    "ch": 32, "ch_mult": [1, 2, 4, 4], "num_res_blocks": 1,
                    "resolution": 64, "z_channels": 4, "double_z": True,
                    "in_channels": 3, "out_ch": 3, "attn_resolutions": [],
                }},
            },
            "cond_stage_config": {
                "target": "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
            },
        },
    }}
    p = root / "tiny_cldm.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    return p


def test_seg2image_cli_e2e(tmp_path, monkeypatch):
    """Render one tiny seg map through the full CLI: yaml → ControlSpec →
    load → DDIM → decode → PNG on disk."""
    from PIL import Image

    from fgdm_tpu import builders
    from fgdm_tpu.cli import seg2image
    from fgdm_tpu.models.clip import CLIPTextEncoder

    monkeypatch.setattr(
        builders, "build_clip",
        lambda dtype=jnp.bfloat16, **p: CLIPTextEncoder(
            vocab_size=49408, embed_dim=64, num_layers=1, num_heads=4,
            dtype=dtype),
    )

    cfg = _tiny_cldm_yaml(tmp_path)
    seg_dir = tmp_path / "maps" / "sample2"
    seg_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        seg_dir / "m0.png")
    out = tmp_path / "out"

    seg2image.main([
        "--data_dir", str(tmp_path / "maps"), "--outdir", str(out),
        "--config", str(cfg), "--image_resolution", "64",
        "--ddim_steps", "2", "--num_images", "1", "--eta", "0.5",
        "--strength", "0.8", "--prompt", "a tiny test",
        "--precision", "full",
    ])
    renders = list(out.glob("*_render.png"))
    assert len(renders) == 1, list(out.iterdir())
    arr = np.asarray(Image.open(renders[0]))
    assert arr.shape == (64, 64, 3)
    assert arr.std() > 0  # decoded something, not a constant field
