"""Eval CLI: CLIP-score/FID JSON over generated samples or an image
directory, with injectable toy backends (VERDICT r2 #10)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fgdm_tpu.cli import eval as eval_cli
from fgdm_tpu.models.clip import CLIPTextEncoder, CLIPTokenizer
from fgdm_tpu.utils.clip_score import CLIPScorer, CLIPVisionEncoder


def _toy_scorer_factory(opt):
    vision = CLIPVisionEncoder(image_size=32, patch_size=8, hidden=64,
                               layers=1, heads=4, proj_dim=32)
    text = CLIPTextEncoder(vocab_size=49408, embed_dim=48, num_layers=1,
                           num_heads=4)
    vp = vision.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tp = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))
    proj = jax.random.normal(jax.random.PRNGKey(2), (48, 32))
    return (CLIPScorer(vp, tp, proj, vision_def=vision, text_def=text),
            CLIPTokenizer(vocab_dir=opt.vocab_dir))


def _write_images(d, n, seed):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)).save(
            os.path.join(d, f"{i:03}.png"))


def test_eval_images_dir(tmp_path):
    gen, ref = str(tmp_path / "gen"), str(tmp_path / "ref")
    _write_images(gen, 6, 0)
    _write_images(ref, 6, 1)
    pf = tmp_path / "prompts.txt"
    pf.write_text("\n".join(f"prompt {i}" for i in range(6)))
    out = tmp_path / "metrics.json"
    m = eval_cli.main(
        ["--images_dir", gen, "--ref_dir", ref, "--from-file", str(pf),
         "--out", str(out)],
        scorer_factory=_toy_scorer_factory)
    assert m["n_images"] == 6
    assert -1.0 <= m["clip_score"] <= 1.0
    assert np.isfinite(m["fid"]) and m["fid"] >= 0
    assert m["fid_backend"] == "clip"
    assert json.loads(out.read_text())["n_images"] == 6
    # identical sets → FID 0
    m0 = eval_cli.main(["--images_dir", gen, "--ref_dir", gen],
                       scorer_factory=_toy_scorer_factory)
    assert abs(m0["fid"]) < 1e-3
    assert "clip_score" not in m0  # no prompts given


def test_eval_prompt_count_mismatch(tmp_path):
    gen = str(tmp_path / "gen")
    _write_images(gen, 4, 0)
    pf = tmp_path / "p.txt"
    pf.write_text("one\ntwo\n")
    with pytest.raises(SystemExit, match="4 images vs 2 prompts"):
        eval_cli.main(["--images_dir", gen, "--from-file", str(pf)],
                      scorer_factory=_toy_scorer_factory)


def test_eval_requires_clip_ckpt(tmp_path):
    gen = str(tmp_path / "gen")
    _write_images(gen, 2, 0)
    with pytest.raises(SystemExit, match="clip_ckpt is required"):
        eval_cli.main(["--images_dir", gen])


def test_eval_generates_and_scores(tmp_path, monkeypatch):
    """Full path: tiny config → sample → CLIP score (toy towers)."""
    import yaml

    from fgdm_tpu import builders
    from tests.test_txt2img_cli import TINY_MODEL

    monkeypatch.setattr(
        builders, "build_clip",
        lambda dtype=jnp.bfloat16, **p: CLIPTextEncoder(
            vocab_size=49408, embed_dim=64, num_layers=1, num_heads=4,
            dtype=dtype),
    )
    cfg = tmp_path / "tiny.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump({"model": TINY_MODEL}, f)
    pf = tmp_path / "p.txt"
    pf.write_text("a red cube\na blue ball\nthird thing\n")
    outdir = str(tmp_path / "gen")
    m = eval_cli.main(
        ["--config", str(cfg), "--from-file", str(pf), "--n_samples", "2",
         "--ddim_steps", "2", "--H", "64", "--W", "64",
         "--precision", "full", "--outdir", outdir],
        scorer_factory=_toy_scorer_factory)
    assert m["n_images"] == 3
    assert -1.0 <= m["clip_score"] <= 1.0
    assert len(os.listdir(outdir)) == 3
