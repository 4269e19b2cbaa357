"""End-to-end training-CLI integration: config YAML → data → mesh →
pjit steps → checkpoints → metrics, on a synthetic COCO tree."""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_cli")
    data = root / "coco"
    rng = np.random.default_rng(0)
    (data / "images" / "train2017").mkdir(parents=True)
    (data / "annotations" / "train2017").mkdir(parents=True)
    anns = []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (80, 70, 3)).astype(np.uint8)
                        ).save(data / "images" / "train2017" / f"{i:012d}.jpg")
        Image.fromarray(rng.integers(0, 20, (80, 70)).astype(np.uint8)
                        ).save(data / "annotations" / "train2017" / f"{i:012d}.png")
        anns.append({"image_id": i, "caption": f"thing {i}"})
    with open(data / "annotations" / "captions_train2017.json", "w") as f:
        json.dump({"annotations": anns}, f)

    cfg = {
        "model": {
            "base_learning_rate": 1e-4,
            "target": "ldm.models.diffusion.ddpm.LatentDiffusion",
            "params": {
                "image_size": 8,
                "scale_factor": 0.18215,
                "linear_start": 0.00085,
                "linear_end": 0.0120,
                "freeze_backbone": True,
                "use_ema": True,
                "apply_distill_loss": False,
                "unet_config": {
                    "target": "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                    "params": {
                        "model_channels": 32, "num_heads": 4,
                        "context_dim": 64, "channel_mult": [1, 2],
                        "attention_resolutions": [1, 2],
                        "num_res_blocks": 1,
                    },
                },
                "first_stage_config": {
                    "target": "ldm.models.autoencoder.AutoencoderKL",
                    "params": {"embed_dim": 4, "ddconfig": {
                        "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
                        "resolution": 64, "z_channels": 4, "double_z": True,
                        "in_channels": 3, "out_ch": 3,
                        "attn_resolutions": [],
                    }},
                },
                "cond_stage_config": {
                    "target": "ldm.modules.encoders.modules.FrozenCLIPEmbedder",
                },
            },
        },
        "data": {
            "target": "main.DataModuleFromConfig",
            "params": {
                "batch_size": 8,
                "train": {
                    "target": "ldm.data.semantic.load_data",
                    "params": {"dataset_mode": "coco",
                               "data_dir": str(data),
                               "image_size": 32, "is_train": True},
                },
            },
        },
    }
    cfg_path = root / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, cfg_path


def _tiny_clip(monkeypatch):
    """Shrink the CLIP tower so the test stays fast."""
    import jax.numpy as jnp

    from fgdm_tpu import builders
    from fgdm_tpu.models.clip import CLIPTextEncoder

    monkeypatch.setattr(
        builders, "build_clip",
        lambda dtype=jnp.bfloat16, **p: CLIPTextEncoder(
            vocab_size=49408, embed_dim=64, num_layers=1, num_heads=4,
            dtype=dtype),
    )


def test_train_cli_two_steps(workspace, monkeypatch):
    root, cfg_path = workspace
    _tiny_clip(monkeypatch)
    from fgdm_tpu.cli import train as train_cli

    logdir = root / "logs"
    train_cli.main([
        "-b", str(cfg_path), "-t", "--max_steps", "2",
        "-l", str(logdir), "-n", "tinyrun", "--seed", "7",
        "model.params.unet_config.params.model_channels=32",
    ])
    runs = list(logdir.iterdir())
    assert len(runs) == 1
    run = runs[0]
    # config snapshot + checkpoints written
    assert any(p.suffix == ".yaml" for p in (run / "configs").iterdir())
    assert (run / "checkpoints").exists()
    ckpts = list((run / "checkpoints").iterdir())
    assert ckpts, "no checkpoint saved"
    # per-step loss curve written (buffered drain: print cadence + finally)
    rows = [json.loads(line)
            for line in (run / "metrics.jsonl").read_text().splitlines()]
    assert [r["step"] for r in rows] == [0, 1]
    assert all(np.isfinite(r["train/loss"]) for r in rows)


def test_train_cli_resume_restores_full_state(workspace, monkeypatch, capsys):
    """-r restores params+opt+EMA+step from the latest checkpoint and
    continues counting from there (reference main.py:502-520 semantics)."""
    root, cfg_path = workspace
    _tiny_clip(monkeypatch)
    from fgdm_tpu.cli import train as train_cli

    logdir = root / "logs_resume"
    train_cli.main([
        "-b", str(cfg_path), "-t", "--max_steps", "2",
        "-l", str(logdir), "-n", "resumable", "--seed", "7",
        "--ckpt_every", "1",
    ])
    run = next(logdir.iterdir())
    capsys.readouterr()
    train_cli.main([
        "-r", str(run), "-t", "--max_steps", "4", "--seed", "7",
        "--ckpt_every", "1",
    ])
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 2" in out
    assert "done at step 4" in out


def test_train_cli_sketch_condition(workspace, monkeypatch):
    """use_sketch config: the PiDiNet target synthesis runs inside the
    compiled step (random-init smoke mode)."""
    root, cfg_path = workspace
    _tiny_clip(monkeypatch)
    monkeypatch.setenv("FGDM_ALLOW_RANDOM_ANNOTATORS", "1")
    from fgdm_tpu.cli import train as train_cli

    logdir = root / "logs_sketch"
    train_cli.main([
        "-b", str(cfg_path), "-t", "--max_steps", "1",
        "-l", str(logdir), "-n", "sketchrun", "--seed", "7",
        "model.params.use_sketch=True",
    ])
    run = next(logdir.iterdir())
    assert list((run / "checkpoints").iterdir())


def test_train_cli_validate_only(workspace, monkeypatch):
    """Without -t the CLI validates config and exits cleanly."""
    root, cfg_path = workspace
    _tiny_clip(monkeypatch)
    from fgdm_tpu.cli import train as train_cli

    train_cli.main(["-b", str(cfg_path), "-l", str(root / "logs2")])


@pytest.mark.parametrize("use_ema", ["true", "false"])
def test_train_cli_image_logger(workspace, monkeypatch, use_ema):
    """--img_log_freq wires the reference ImageLogger callback: diagnostic
    grids land under <run>/images at the requested cadence.  Parametrized
    over use_ema: plotting reads ema_full_params() with EMA on and the
    full_params property without (a call-vs-property mixup here once only
    crashed in the non-EMA branch)."""
    root, cfg_path = workspace
    _tiny_clip(monkeypatch)
    from fgdm_tpu.cli import train as train_cli

    logdir = root / f"logs_imglog_{use_ema}"
    train_cli.main([
        f"model.params.use_ema={use_ema}",
        "-b", str(cfg_path), "-t", "--max_steps", "2",
        "-l", str(logdir), "-n", "imglog", "--seed", "7",
        "--img_log_freq", "2",
    ])
    run = next(logdir.iterdir())
    pngs = list((run / "images").glob("*.png"))
    keys = {p.name.rsplit("_gs-", 1)[0] for p in pngs}
    # full reference diagnostic set from one logging event at step 0
    assert {"inputs", "reconstruction", "samples", "samples_inpainting",
            "samples_outpainting", "mask", "denoise_row", "diffusion_row",
            "progressive_row"} <= keys, sorted(keys)


def test_train_cli_fsdp(workspace, monkeypatch, capsys):
    """--fsdp: the train loop runs with ZeRO-3-sharded state (storage split
    over the 8 virtual devices), checkpoints save, and the saved params
    match a replicated-DP run step-for-step (identical math)."""
    root, cfg_path = workspace
    _tiny_clip(monkeypatch)
    monkeypatch.setenv("FGDM_FSDP_MIN_SIZE", "1024")  # tiny leaves shard too
    from fgdm_tpu.cli import train as train_cli

    outs = {}
    for name, extra in {"dp": [], "fsdp": ["--fsdp"]}.items():
        logdir = root / f"logs_fsdp_{name}"
        train_cli.main([
            "-b", str(cfg_path), "-t", "--max_steps", "2",
            "-l", str(logdir), "-n", name, "--seed", "7",
            "--ckpt_every", "1", *extra,
        ])
        outs[name] = next(logdir.iterdir())
    out = capsys.readouterr().out
    assert "fsdp:" in out and "of bytes over 8 devices" in out

    # restored checkpoints agree: sharded storage, identical training math
    import jax

    from fgdm_tpu.checkpoint.orbax_io import CheckpointManager

    trees = {}
    for name, run in outs.items():
        mgr = CheckpointManager(str(run / "checkpoints"), keep=3,
                                save_interval_steps=1)
        # plain device restore: fine at tiny scale (restore_host needs a
        # template when orbax metadata is absent in-process)
        trees[name] = mgr.restore()
    d = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float64) -
                                         np.asarray(b, np.float64)))),
        trees["dp"]["params"], trees["fsdp"]["params"])
    assert max(jax.tree.leaves(d)) < 1e-5, sorted(
        jax.tree.leaves(d), reverse=True)[:3]
