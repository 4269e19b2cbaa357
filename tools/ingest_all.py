"""One-command ingest playbook for every released checkpoint family.

The product promise is loading the reference's shipped weights: SD-v1-4/5
and the FG-DM factor checkpoints (`scripts/txt2img_fgdm_inference.py:23-38`,
`scripts/download_models.sh:1-5`), the ControlNet stage checkpoints
(`controlnet/initialize_cn.py:25-41`), the seven annotator checkpoints
(`controlnet/annotator/*/__init__.py` download paths), the CLIP tokenizer
vocab, and the FID InceptionV3 pool3 weights.  This environment has zero
egress, so the real files have never been loadable here — this tool makes
the day they are a one-command verification instead of archaeology:

    python tools/ingest_all.py --weights_dir /path/to/models

It scans the directory for each family's known filename(s), runs the
STRICT mapper for that family, and prints a per-file report of loaded /
missing / unexpected keys.  Exit code is nonzero if any file that IS
present fails its strict ingest (absent families are reported as absent;
add --require-all to fail on those too).

``--geometry tiny`` swaps the SD-sized model definitions for the test
suite's tiny geometry so the end-to-end plumbing is exercisable on
synthetic reference-schema checkpoints (tests/test_ingest_all.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # host-RAM ingest; never the chip

import jax.numpy as jnp  # noqa: E402


# --------------------------------------------------------------------------
# model-family geometry
# --------------------------------------------------------------------------

def _ldm_defs(geometry: str):
    from fgdm_tpu.checkpoint.loader import sd_clip, sd_unet, sd_vae

    if geometry == "sd":
        return (sd_unet(dtype=jnp.float32), sd_vae(dtype=jnp.float32),
                sd_clip(dtype=jnp.float32), 32)
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel

    unet = UNetModel(model_channels=32, num_heads=4, context_dim=64,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=128, embed_dim=64, num_layers=2,
                           num_heads=4)
    return unet, vae, clip, 8


def _cldm_defs(geometry: str):
    from fgdm_tpu.checkpoint.loader import sd_controlnet, sd_unet

    if geometry == "sd":
        return (sd_unet(dtype=jnp.float32, use_adapter=False),
                sd_controlnet(dtype=jnp.float32), 64)
    from fgdm_tpu.models.controlnet import ControlNet
    from fgdm_tpu.models.unet import UNetModel

    unet = UNetModel(model_channels=32, num_heads=4, context_dim=64,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, use_adapter=False, dtype=jnp.float32)
    cn = ControlNet(model_channels=32, num_heads=4, context_dim=64,
                    channel_mult=(1, 2), attention_resolutions=(1, 2),
                    num_res_blocks=1, dtype=jnp.float32)
    return unet, cn, 8


def _abstract(module, *args, **kwargs):
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _report(loaded: int, missing, unexpected, note: str = "",
            adapter_ok: bool = False) -> dict:
    """adapter_ok: missing adapter-subtree keys don't fail (plain SD
    checkpoints legitimately lack the FG-DM adapter; the loader fills them
    from module init, reference strict=False semantics).

    ``loaded`` arrives as the ASSEMBLED leaf count; the reported number
    subtracts init-filled leaves so it only counts arrays that actually
    came from the file (an operator reads it as file-verification
    evidence)."""
    hard_missing = [k for k in missing
                    if not (adapter_ok and "adapter" in k)]
    ok = not hard_missing and not unexpected
    return {
        "ok": bool(ok),
        "loaded": max(0, int(loaded) - len(missing)),
        "missing": len(missing),
        "missing_examples": list(missing)[:5],
        "unexpected": len(unexpected),
        "unexpected_examples": list(unexpected)[:5],
        **({"note": note} if note else {}),
    }


def _n_leaves(tree) -> int:
    return len(jax.tree.leaves(tree))


# --------------------------------------------------------------------------
# per-family runners: path -> report dict
# --------------------------------------------------------------------------

def run_ldm(path: str, geometry: str, adapter_ok: bool) -> dict:
    """SD-v1-x / fgdm_{seg,depth,normal,scribble} full LDM checkpoints."""
    from fgdm_tpu.checkpoint import torch_ingest as ti

    unet, vae, clip, latent = _ldm_defs(geometry)
    x = jnp.zeros((1, latent, latent, unet.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, clip.max_length, clip.embed_dim))
    img = jnp.zeros((1, latent * 8, latent * 8, vae.in_channels))
    ids = jnp.zeros((1, clip.max_length), jnp.int32)

    sd = ti.load_torch_state_dict(path)
    sd = ti.apply_key_surgery(sd, ignore_keys=("model_ema.",))
    up, m1, u1 = ti.ingest_unet(sd, expect=_abstract(unet, x, t, ctx))
    vp, m2, u2 = ti.ingest_vae(sd, expect=_abstract(vae, img,
                                                    sample_posterior=False))
    cp, m3, u3 = ti.ingest_clip(sd, expect=_abstract(clip, ids))
    loaded = _n_leaves(up) + _n_leaves(vp) + _n_leaves(cp)
    return _report(loaded, m1 + m2 + m3, u1 + u2 + u3,
                   adapter_ok=adapter_ok)


def run_cldm(path: str, geometry: str) -> dict:
    """fgdm_control_sd15_* ControlNet-stage checkpoints."""
    from fgdm_tpu.checkpoint import torch_ingest as ti

    unet, cn, latent = _cldm_defs(geometry)
    x = jnp.zeros((1, latent, latent, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, unet.context_dim or 768))
    hint = jnp.zeros((1, latent * 8, latent * 8, 3))

    sd = ti.load_torch_state_dict(path)
    up, m1, u1 = ti.ingest_unet(sd, expect=_abstract(unet, x, t, ctx))
    np_, m2, u2 = ti.ingest_controlnet(sd, expect=_abstract(cn, x, hint, t,
                                                            ctx))
    return _report(_n_leaves(up) + _n_leaves(np_), m1 + m2, u1 + u2)


def run_uniformer(path: str) -> dict:
    from fgdm_tpu.annotators.uniformer import load_uniformer

    det = load_uniformer(path)  # strict: raises on any mismatch
    return _report(_n_leaves(det.params), [], [])


def run_midas(path: str) -> dict:
    from fgdm_tpu.annotators.midas import load_midas

    det = load_midas(path)
    return _report(_n_leaves(det.params), [], [])


def run_pidinet(path: str) -> dict:
    from fgdm_tpu.annotators.pidinet import load_pidinet

    _, params = load_pidinet(path)
    return _report(_n_leaves(params), [], [])


def run_hed(path: str) -> dict:
    from fgdm_tpu.annotators.hed import ControlNetHED
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_hed
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    expect = _abstract(ControlNetHED(), jnp.zeros((1, 64, 64, 3)))
    params, missing, unexpected = ingest_hed(load_torch_state_dict(path),
                                             expect=expect)
    return _report(_n_leaves(params), missing, unexpected)


def run_mlsd(path: str) -> dict:
    from fgdm_tpu.annotators.mlsd import MobileV2MLSDLarge
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_mlsd
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    expect = _abstract(MobileV2MLSDLarge(), jnp.zeros((1, 64, 64, 4)))
    params, missing, unexpected = ingest_mlsd(load_torch_state_dict(path),
                                              expect=expect)
    return _report(_n_leaves(params), missing, unexpected)


def run_openpose_body(path: str) -> dict:
    from fgdm_tpu.annotators.openpose import BodyPoseNet
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_openpose
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    expect = _abstract(BodyPoseNet(), jnp.zeros((1, 64, 64, 3)))
    params, missing, unexpected = ingest_openpose(
        load_torch_state_dict(path), expect=expect)
    return _report(_n_leaves(params), missing, unexpected)


def run_openpose_hand(path: str) -> dict:
    from fgdm_tpu.annotators.openpose import HandPoseNet
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_handpose
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    expect = _abstract(HandPoseNet(), jnp.zeros((1, 64, 64, 3)))
    params, missing, unexpected = ingest_handpose(
        load_torch_state_dict(path), expect=expect)
    return _report(_n_leaves(params), missing, unexpected)


def run_clip_vocab(path: str) -> dict:
    """path is the vocab.json; merges.txt must sit beside it."""
    from fgdm_tpu.models.clip import CLIPTokenizer

    tok = CLIPTokenizer(vocab_dir=os.path.dirname(path))
    if not tok.has_real_vocab:
        return _report(0, ["merges.txt"], [],
                       note="vocab.json found but tokenizer stayed on the "
                            "hash fallback (merges.txt missing/corrupt?)")
    n = len(tok.encode_text("a photograph of an astronaut riding a horse"))
    return _report(len(tok._encoder), [], [],
                   note=f"real BPE active, probe encoded to {n} ids")


def run_inception(path: str) -> dict:
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict
    from fgdm_tpu.utils.inception import ingest_inception

    params = ingest_inception(load_torch_state_dict(path))  # raises on gap
    return _report(len(params), [], [])


# --------------------------------------------------------------------------
# family registry: (family, filenames to look for, runner)
# --------------------------------------------------------------------------

def families(geometry: str):
    return [
        ("sd-v1-4", ["sd-v1-4.ckpt", "model.ckpt"],
         lambda p: run_ldm(p, geometry, adapter_ok=True)),
        ("sd-v1-5", ["sd-v1-5.ckpt", "v1-5-pruned-emaonly.ckpt"],
         lambda p: run_ldm(p, geometry, adapter_ok=True)),
        ("fgdm-seg", ["fgdm_seg.pth"],
         lambda p: run_ldm(p, geometry, adapter_ok=False)),
        ("fgdm-depth", ["fgdm_depth.pth"],
         lambda p: run_ldm(p, geometry, adapter_ok=False)),
        ("fgdm-normal", ["fgdm_normal.pth"],
         lambda p: run_ldm(p, geometry, adapter_ok=False)),
        ("fgdm-scribble", ["fgdm_scribble.pth", "fgdm_sketch.pth"],
         lambda p: run_ldm(p, geometry, adapter_ok=False)),
        ("control-seg", ["fgdm_control_sd15_seg.pth"],
         lambda p: run_cldm(p, geometry)),
        ("control-depth", ["fgdm_control_sd15_depth.pth"],
         lambda p: run_cldm(p, geometry)),
        ("control-normal", ["fgdm_control_sd15_normal.pth"],
         lambda p: run_cldm(p, geometry)),
        ("control-scribble", ["fgdm_control_sd15_scribble.pth"],
         lambda p: run_cldm(p, geometry)),
        ("uniformer", ["upernet_global_small.pth"], run_uniformer),
        ("midas", ["dpt_hybrid-midas-501f0c75.pt"], run_midas),
        ("hed", ["ControlNetHED.pth"], run_hed),
        ("mlsd", ["mlsd_large_512_fp32.pth"], run_mlsd),
        ("openpose-body", ["body_pose_model.pth"], run_openpose_body),
        ("openpose-hand", ["hand_pose_model.pth"], run_openpose_hand),
        ("pidinet", ["table5_pidinet.pth"], run_pidinet),
        ("clip-vocab", ["vocab.json"], run_clip_vocab),
        ("inception", ["pt_inception-2015-12-21-26bd7ee1.pth",
                       "inception_v3_google-0cc3c7bd.pth"], run_inception),
    ]


def _find(weights_dir: str, names) -> str | None:
    for name in names:
        p = os.path.join(weights_dir, name)
        if os.path.exists(p):
            return p
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights_dir", required=True)
    ap.add_argument("--families", default="",
                    help="comma-separated subset (default: all)")
    ap.add_argument("--geometry", choices=("sd", "tiny"), default="sd",
                    help="model-family defs: production SD (default) or the "
                         "test suite's tiny geometry (plumbing tests)")
    ap.add_argument("--require-all", action="store_true",
                    help="absent families fail the run too")
    ap.add_argument("--json", default="", help="also write the report here")
    args = ap.parse_args(argv)

    want = {f.strip() for f in args.families.split(",") if f.strip()}
    known = {name for name, _, _ in families(args.geometry)}
    unknown = sorted(want - known)
    if unknown:
        ap.error(f"unknown families {unknown}; known: {sorted(known)}")
    report, n_fail, n_absent, n_ok = {}, 0, 0, 0
    for name, filenames, runner in families(args.geometry):
        if want and name not in want:
            continue
        path = _find(args.weights_dir, filenames)
        if path is None:
            report[name] = {"ok": None, "absent": True}
            n_absent += 1
            print(f"[{name:<16}] absent ({filenames[0]})")
            continue
        try:
            r = runner(path)
        except Exception as e:  # strict loaders raise on mismatch
            r = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            traceback.print_exc(limit=2)
        r["file"] = os.path.basename(path)
        report[name] = r
        if r["ok"]:
            n_ok += 1
            filled = (f", {r['missing']} filled from init"
                      if r.get("missing") else "")
            print(f"[{name:<16}] OK  {r['file']}: {r.get('loaded', '?')} "
                  f"arrays from file{filled}"
                  + (f" — {r['note']}" if r.get("note") else ""))
        else:
            n_fail += 1
            print(f"[{name:<16}] FAIL {r['file']}: "
                  + (r.get("error")
                     or f"{r['missing']} missing {r['missing_examples']}, "
                        f"{r['unexpected']} unexpected "
                        f"{r['unexpected_examples']}"))

    print(f"\ningest_all: {n_ok} ok, {n_fail} failed, {n_absent} absent "
          f"(geometry={args.geometry})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    return 1 if (n_fail or (args.require_all and n_absent)) else 0


if __name__ == "__main__":
    sys.exit(main())
