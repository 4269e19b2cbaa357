"""End-to-end test of the one-command ingest playbook (tools/ingest_all.py).

Builds a weights directory of synthetic reference-schema checkpoints —
FG-DM factor (tiny geometry via torch_export), ControlNet stage, HED
annotator (full schema), CLIP vocab files, InceptionV3 pool3 — then runs
the tool as a real subprocess and checks the per-family report + exit
codes, including the failure path (a corrupted checkpoint must flip the
exit code)."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fgdm_tpu.checkpoint import torch_export as te

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "ingest_all.py")

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)


def _rand_tree(params, seed=0):
    leaves, treedef = jax.tree.flatten(params)
    rng = np.random.default_rng(seed)
    leaves = [jnp.asarray(rng.standard_normal(l.shape), l.dtype)
              for l in leaves]
    return jax.tree.unflatten(treedef, leaves)


def _save_sd(sd, path):
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd.items()}, path)


def _build_fgdm_ckpt(path):
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel

    unet = UNetModel(**UNET_TINY)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=128, embed_dim=64, num_layers=2,
                           num_heads=4)
    up = _rand_tree(unet.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, 4)),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 77, 64))))
    vp = _rand_tree(vae.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 64, 64, 3)),
                             sample_posterior=False), seed=1)
    cp = _rand_tree(clip.init(jax.random.PRNGKey(2),
                              jnp.zeros((1, 77), jnp.int32)), seed=2)
    sd = {}
    sd.update(te.export_unet(up))
    sd.update(te.export_vae(vp))
    sd.update(te.export_clip(cp))
    _save_sd(sd, path)


def _build_cldm_ckpt(path):
    from fgdm_tpu.models.controlnet import ControlNet
    from fgdm_tpu.models.unet import UNetModel

    unet = UNetModel(**{**UNET_TINY, "use_adapter": False})
    cn = ControlNet(model_channels=32, num_heads=4, context_dim=64,
                    channel_mult=(1, 2), attention_resolutions=(1, 2),
                    num_res_blocks=1, dtype=jnp.float32)
    up = _rand_tree(unet.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 8, 8, 4)),
                              jnp.zeros((1,), jnp.int32),
                              jnp.zeros((1, 77, 64))))
    np_ = _rand_tree(cn.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 8, 8, 4)),
                             jnp.zeros((1, 64, 64, 3)),
                             jnp.zeros((1,), jnp.int32),
                             jnp.zeros((1, 77, 64))), seed=3)
    sd = {}
    sd.update(te.export_unet(up))
    sd.update(te.export_controlnet(np_))
    _save_sd(sd, path)


def _build_hed_ckpt(path):
    """Full-schema ControlNetHED synthetic state dict (the net is small)."""
    from flax import traverse_util

    from fgdm_tpu.annotators.hed import ControlNetHED

    hed = ControlNetHED()
    params = _rand_tree(hed.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 3))), seed=4)
    flat = traverse_util.flatten_dict(params["params"])
    sd = {}
    for p, v in flat.items():
        v = np.asarray(v)
        if p == ("norm",):
            sd["norm"] = v.reshape(1, 3, 1, 1)
            continue
        leaf = "weight" if p[-1] == "kernel" else "bias"
        if v.ndim == 4:
            v = v.transpose(3, 2, 0, 1)  # HWIO → OIHW
        if p[1].startswith("convs_"):
            sd[f"{p[0]}.convs.{p[1][-1]}.{leaf}"] = v
        else:
            sd[f"{p[0]}.projection.{leaf}"] = v
    _save_sd(sd, path)


def _build_inception_ckpt(path):
    from fgdm_tpu.utils.inception import _conv_specs, expected_inception_keys

    rng = np.random.default_rng(5)
    sd = {}
    for name, cin, cout, kh, kw in _conv_specs():
        sd[f"{name}.conv.weight"] = rng.standard_normal(
            (cout, cin, kh, kw)).astype(np.float32)
        sd[f"{name}.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{name}.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{name}.bn.running_var"] = np.ones(cout, np.float32)
    assert set(sd) == set(expected_inception_keys())
    _save_sd(sd, path)


def _build_vocab(d):
    # toy byte-level BPE (same shape as tests/test_tokenizer.py)
    tokens = {ch: i for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz ")}
    for extra in ("c a", "ca t</w>"):
        tokens["".join(extra.split())] = len(tokens)
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(tokens, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version\nc a\nca t</w>\n")


@pytest.fixture(scope="module")
def weights_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("weights")
    _build_fgdm_ckpt(d / "fgdm_seg.pth")
    _build_cldm_ckpt(d / "fgdm_control_sd15_seg.pth")
    _build_hed_ckpt(d / "ControlNetHED.pth")
    _build_inception_ckpt(d / "pt_inception-2015-12-21-26bd7ee1.pth")
    _build_vocab(d)
    return d


def _run_tool(*args):
    return subprocess.run(
        [sys.executable, TOOL, *args],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )


def test_ingest_all_green(weights_dir, tmp_path):
    out_json = tmp_path / "report.json"
    res = _run_tool("--weights_dir", str(weights_dir), "--geometry", "tiny",
                    "--json", str(out_json))
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    report = json.loads(out_json.read_text())
    for fam in ("fgdm-seg", "control-seg", "hed", "clip-vocab", "inception"):
        assert report[fam]["ok"] is True, (fam, report[fam])
    # families with no file present are reported absent, not failed
    assert report["uniformer"].get("absent") is True
    assert "ok, 0 failed" in res.stdout


def test_ingest_all_fails_on_corrupt_ckpt(weights_dir, tmp_path):
    """A checkpoint missing a key must fail its family and the exit code."""
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    sd = torch.load(weights_dir / "ControlNetHED.pth", weights_only=True)
    dropped = sorted(sd)[0]
    del sd[dropped]
    torch.save(sd, bad_dir / "ControlNetHED.pth")
    res = _run_tool("--weights_dir", str(bad_dir), "--geometry", "tiny",
                    "--families", "hed")
    assert res.returncode == 1, res.stdout
    assert "FAIL" in res.stdout


def test_ingest_all_require_all(weights_dir):
    """--require-all flips absent families into failures."""
    res = _run_tool("--weights_dir", str(weights_dir), "--geometry", "tiny",
                    "--require-all")
    assert res.returncode == 1


def test_ingest_all_rejects_unknown_family(weights_dir):
    """A typo'd --families must error loudly, not silently verify nothing
    and exit 0."""
    res = _run_tool("--weights_dir", str(weights_dir), "--geometry", "tiny",
                    "--families", "contro-seg")
    assert res.returncode != 0
    assert "unknown families" in (res.stdout + res.stderr)


def test_report_loaded_counts_only_file_arrays():
    """'loaded' excludes leaves filled from module init (missing keys)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import ingest_all

    r = ingest_all._report(10, ["a.adapter.w", "b.adapter.k"], [],
                           adapter_ok=True)
    assert r["ok"] is True and r["loaded"] == 8 and r["missing"] == 2
