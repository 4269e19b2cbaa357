"""txt2img CLI end-to-end: single-factor path and the --factors N-factor
chain (VERDICT r2 #7), on tiny configs."""

import os

import numpy as np
import pytest
import yaml
from PIL import Image

TINY_MODEL = {
    "base_learning_rate": 1e-4,
    "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
    "params": {
        "image_size": 8,
        "scale_factor": 0.18215,
        "linear_start": 0.00085,
        "linear_end": 0.0120,
        "unet_config": {
            "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
            "params": {
                "model_channels": 32, "num_heads": 4, "context_dim": 64,
                "channel_mult": [1, 2], "attention_resolutions": [1, 2],
                "num_res_blocks": 1,
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
        "cond_stage_config": {
            "target": "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
        },
    },
}


@pytest.fixture()
def tiny_cfg(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from fgdm_tpu import builders
    from fgdm_tpu.models.clip import CLIPTextEncoder

    monkeypatch.setattr(
        builders, "build_clip",
        lambda dtype=jnp.bfloat16, **p: CLIPTextEncoder(
            vocab_size=49408, embed_dim=64, num_layers=1, num_heads=4,
            dtype=dtype),
    )
    p = tmp_path / "tiny.yaml"
    with open(p, "w") as f:
        yaml.safe_dump({"model": TINY_MODEL}, f)
    return str(p)


def _pngs_under(d):
    out = []
    for root, _, files in os.walk(d):
        out += [os.path.join(root, f) for f in files if f.endswith(".png")]
    return sorted(out)


def test_single_factor_cli(tiny_cfg, tmp_path):
    from fgdm_tpu.cli.txt2img_fgdm import main

    outdir = str(tmp_path / "out1")
    main(["--prompt", "a cat", "--config", tiny_cfg, "--ckpt", "/nonexistent",
          "--outdir", outdir, "--n_samples", "2", "--ddim_steps", "5",
          "--H", "64", "--W", "64", "--precision", "full", "--seed", "3"])
    pngs = _pngs_under(outdir)
    assert len(pngs) == 2
    arr = np.asarray(Image.open(pngs[0]))
    # tiny VAE (ch_mult [1,2]) upsamples x2: latent (H//8)^2 -> 16^2 pixels
    assert arr.shape == (16, 16, 3)


def test_single_factor_cli_dpm(tiny_cfg, tmp_path):
    """--dpm under the jitted sample path: NoiseScheduleVP's log table must
    build from a *traced* schedule (the pipeline is a jit argument — it
    used to call host np.float64 on the tracer and crash)."""
    from fgdm_tpu.cli.txt2img_fgdm import main

    outdir = str(tmp_path / "out_dpm")
    main(["--prompt", "a cat", "--config", tiny_cfg, "--ckpt", "/nonexistent",
          "--dpm", "--outdir", outdir, "--n_samples", "1", "--ddim_steps",
          "4", "--H", "64", "--W", "64", "--precision", "full", "--seed",
          "3", "--skip_grid"])
    pngs = _pngs_under(outdir)
    assert len(pngs) == 1
    assert np.isfinite(np.asarray(Image.open(pngs[0])).astype(float)).all()


def test_factor_chain_cli_sampler_flags(tiny_cfg, tmp_path):
    """--factors + --dpm/--plms: the N-factor chain honors the sampler
    flags (factor_sampler plumbing)."""
    from fgdm_tpu.cli.txt2img_fgdm import main

    for flag in ("--dpm", "--plms"):
        outdir = str(tmp_path / f"outn_{flag.strip('-')}")
        main(["--prompt", "a dog", "--config", tiny_cfg,
              "--factors", "seg,depth", "--factor_ckpts", ",", flag,
              "--outdir", outdir, "--n_samples", "1", "--ddim_steps", "3",
              "--H", "64", "--W", "64", "--precision", "full", "--seed", "3"])
        seg = _pngs_under(os.path.join(outdir, "factor_seg"))
        depth = _pngs_under(os.path.join(outdir, "factor_depth"))
        assert len(seg) == 1 and len(depth) == 1


def test_factor_chain_cli(tiny_cfg, tmp_path):
    """--factors seg,depth: two chained condition factors, per-factor output
    dirs, the second factor adapter-prompted by the first."""
    from fgdm_tpu.cli.txt2img_fgdm import main

    outdir = str(tmp_path / "outn")
    main(["--prompt", "a dog | a depth map of a dog", "--config", tiny_cfg,
          "--factors", "seg,depth", "--factor_ckpts", ",",
          "--outdir", outdir, "--n_samples", "2", "--ddim_steps", "4",
          "--H", "64", "--W", "64", "--precision", "full", "--seed", "3"])
    seg = _pngs_under(os.path.join(outdir, "factor_seg"))
    depth = _pngs_under(os.path.join(outdir, "factor_depth"))
    assert len(seg) == 2 and len(depth) == 2
    a = np.asarray(Image.open(seg[0]))
    assert a.shape == (16, 16, 3)
    assert np.isfinite(a.astype(np.float64)).all()
    # no-ckpt factors are genuinely random-init (not the zero expect tree):
    # the decoded map must be alive
    assert a.astype(np.float64).std() > 1.0


def test_factor_chain_cli_all_pconds(tiny_cfg, tmp_path):
    """--all_pconds: factor 3 gets factor 1 through an extra adapter
    (multi-adapter composition)."""
    from fgdm_tpu.cli.txt2img_fgdm import main

    outdir = str(tmp_path / "outp")
    main(["--prompt", "a house", "--config", tiny_cfg,
          "--factors", "seg,depth,normal", "--factor_ckpts", ",,",
          "--all_pconds", "--outdir", outdir, "--n_samples", "1",
          "--ddim_steps", "2", "--H", "64", "--W", "64",
          "--precision", "full"])
    for name in ("seg", "depth", "normal"):
        assert len(_pngs_under(os.path.join(outdir, f"factor_{name}"))) == 1


def test_factor_ckpt_count_mismatch_fails(tiny_cfg, tmp_path):
    from fgdm_tpu.cli.txt2img_fgdm import main

    with pytest.raises(SystemExit, match="2 entries for 3 factors"):
        main(["--config", tiny_cfg, "--factors", "seg,depth,normal",
              "--factor_ckpts", "a.pth,b.pth",
              "--outdir", str(tmp_path / "x")])
