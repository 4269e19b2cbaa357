"""Evaluation CLI — CLIP score + FID for FG-DM samples.

Closes the loop the reference leaves to offline tooling: it evaluates with
clean-fid + a CLIP scorer outside the repo (SURVEY §4;
`/root/reference/utils/clip_utils.py:12-80` is the scorer it ships), so a
user must glue generation and scoring by hand.  Here one command either

* generates samples from a checkpoint + prompt file (same model assembly as
  ``cli/txt2img_fgdm.py``) and scores them, or
* scores an existing image directory (``--images_dir``), the clean-fid
  offline workflow.

Metrics land as one JSON object (stdout + ``--out``):
``{"clip_score": ..., "fid": ..., "miou": ..., "n_images": N, ...}``.
FID needs ``--ref_dir`` (real images); the backend is InceptionV3-pool3
when ``--inception_ckpt`` is given (standard FID), else the CLIP tower
(CLIP-FID).  mIoU — the FG-DM paper's condition-adherence metric — needs
``--cond_dir`` (the requested colorized seg maps) + ``--seg_ckpt``
(UniFormer weights to re-segment the generated images).  The other factor
families score the same way: ``--depth_dir``/``--normal_dir`` (MiDaS
re-annotation), ``--sketch_dir`` (PiDiNet edge-F1), ``--pose_dir``
(OpenPose skeleton-F1).  Fails loud when
weights or the CLIP vocab are absent — a hash-fallback tokenizer or
random towers would silently produce garbage metrics.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, List, Optional, Sequence, Tuple


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FG-DM evaluation (TPU)")
    # generation (ignored with --images_dir)
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--prompt", type=str, default=None)
    p.add_argument("--from-file", dest="from_file", type=str, default=None,
                   help="file with one prompt per line")
    p.add_argument("--n_samples", type=int, default=4,
                   help="samples per generation batch")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--precision", type=str, default="autocast",
                   choices=["autocast", "full"])
    p.add_argument("--outdir", type=str, default=None,
                   help="also save generated samples here")
    # scoring inputs
    p.add_argument("--images_dir", type=str, default=None,
                   help="score this directory instead of generating; "
                        "CLIP score pairs images (sorted) with prompts")
    p.add_argument("--ref_dir", type=str, default=None,
                   help="real-image directory (enables FID)")
    p.add_argument("--cond_dir", type=str, default=None,
                   help="requested condition maps (colorized ADE seg, "
                        "sorted to pair with the images) — enables the "
                        "mIoU adherence metric: generated images are "
                        "re-segmented and compared against these maps")
    p.add_argument("--seg_ckpt", type=str, default=None,
                   help="UniFormer seg checkpoint used to re-annotate "
                        "generated images for mIoU")
    p.add_argument("--depth_dir", type=str, default=None,
                   help="requested depth maps (grayscale, sorted to pair "
                        "with the images) — enables scale-shift-invariant "
                        "depth adherence via MiDaS re-annotation")
    p.add_argument("--midas_ckpt", type=str, default=None,
                   help="MiDaS dpt_hybrid checkpoint for "
                        "--depth_dir/--normal_dir")
    p.add_argument("--normal_dir", type=str, default=None,
                   help="requested normal maps (RGB-encoded [-1,1], sorted "
                        "to pair with the images) — enables angular-error "
                        "adherence via MiDaS depth→normal re-annotation")
    p.add_argument("--sketch_dir", type=str, default=None,
                   help="requested sketch/edge maps (grayscale, sorted to "
                        "pair with the images) — enables edge-F1 adherence "
                        "via PiDiNet re-annotation")
    p.add_argument("--pidinet_ckpt", type=str, default=None,
                   help="PiDiNet table5 checkpoint for --sketch_dir")
    p.add_argument("--pose_dir", type=str, default=None,
                   help="requested skeleton renders (sorted to pair with "
                        "the images) — enables pose adherence: generated "
                        "images are re-annotated with OpenPose and scored "
                        "as tolerant skeleton-F1")
    p.add_argument("--openpose_ckpt", type=str, default=None,
                   help="OpenPose body_pose checkpoint for --pose_dir")
    # metric backends
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="CLIP checkpoint (vision+text towers) for the "
                        "scorer; required unless a scorer is injected")
    p.add_argument("--inception_ckpt", type=str, default=None,
                   help="InceptionV3 FID checkpoint "
                        "(pt_inception-2015-12-21 / torchvision schema)")
    p.add_argument("--vocab_dir", type=str, default=None,
                   help="dir with CLIP vocab.json+merges.txt")
    p.add_argument("--out", type=str, default=None,
                   help="write the metrics JSON here too")
    return p


def _load_dir_images(d: str, size=None,
                     nearest: bool = False) -> "np.ndarray":
    """PNG/JPG directory → [N,H,W,3] float in [0,1] (sorted order).
    ``size``: int or (h, w) target; ``nearest=True`` for label-colorized
    maps (bicubic would blend palette colors into off-palette pixels)."""
    import numpy as np
    from PIL import Image

    files = sorted(
        os.path.join(d, f) for f in os.listdir(d)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if not files:
        raise SystemExit(f"[eval] no images under {d}")
    if size is not None and not isinstance(size, (tuple, list)):
        size = (size, size)
    ims = []
    for f in files:
        im = Image.open(f).convert("RGB")
        if size is not None:
            im = im.resize((size[1], size[0]),  # PIL takes (W, H)
                           Image.NEAREST if nearest else Image.BICUBIC)
        ims.append(np.asarray(im, np.float32) / 255.0)
    if size is None:
        hw = ims[0].shape
        if any(i.shape != hw for i in ims):
            raise SystemExit(f"[eval] images under {d} have mixed sizes; "
                             "pass same-size images")
    return np.stack(ims)


def ingest_clip_towers(sd, vision, text):
    """Strict fuzzy ingest of an OpenAI- or HF-schema CLIP state dict into
    the given vision/text tower definitions → (vparams, tparams, proj).

    Handles the schema differences up front: OpenAI's fused attn
    ``in_proj_*`` is split into q/k/v rows, non-parameter buffers
    (position_ids, logit_scale, attn_mask) are dropped, and the text
    projection is transposed to [embed, proj] if stored HF-style.  Raises
    SystemExit when any checkpoint key goes unconsumed OR any tower param
    would stay at random init."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgdm_tpu.checkpoint.fuzzy_ingest import (apply_mapping,
                                                  match_state_dict)

    vp = jax.eval_shape(lambda: vision.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, vision.image_size, vision.image_size, 3))))
    tp = jax.eval_shape(lambda: text.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)))

    def strict_ingest(sub, expect, label):
        mapping, unmatched_t, unmatched_f = match_state_dict(sub, expect)
        if unmatched_t:
            raise SystemExit(
                f"[eval] CLIP {label} ingest failed: {len(unmatched_t)} "
                f"unconsumed ckpt params, e.g. {unmatched_t[:4]}")
        if unmatched_f:
            raise SystemExit(
                f"[eval] CLIP {label} ingest failed: {len(unmatched_f)} "
                f"tower params left at random init, e.g. {unmatched_f[:4]}")
        return apply_mapping(sub, mapping, expect)

    def split_fused_qkv(d):
        out = {}
        for k, v in d.items():
            if k.endswith(("attn.in_proj_weight", "attn.in_proj_bias")):
                q, kk, vv = np.split(np.asarray(v), 3, axis=0)
                stem = k.replace("in_proj_weight", "").replace(
                    "in_proj_bias", "")
                leaf = "weight" if k.endswith("weight") else "bias"
                out[f"{stem}q_proj.{leaf}"] = q
                out[f"{stem}k_proj.{leaf}"] = kk
                out[f"{stem}v_proj.{leaf}"] = vv
            else:
                out[k] = v
        return out

    sd = split_fused_qkv(sd)
    drop = ("position_ids", "logit_scale", "attn_mask",
            "num_batches_tracked")
    sd = {k: v for k, v in sd.items() if not k.endswith(drop)}
    vis_sd = {k: v for k, v in sd.items() if "visual" in k or "vision" in k}
    txt_sd = {k: v for k, v in sd.items()
              if not ("visual" in k or "vision" in k
                      or "text_projection" in k)}
    vparams = strict_ingest(vis_sd, vp, "vision")
    tparams = strict_ingest(txt_sd, tp, "text")
    # explicit membership test: `or` on a numpy array raises on truthiness
    proj = (sd["text_projection"] if "text_projection" in sd
            else sd.get("text_projection.weight"))
    if proj is None:
        raise SystemExit("[eval] CLIP ckpt lacks text_projection")
    proj = np.asarray(proj, np.float32)
    if proj.shape[0] != text.embed_dim:
        proj = proj.T  # HF stores [proj, embed]
    return vparams, tparams, proj


def default_scorer_factory(opt):
    """Build a production CLIPScorer from ``--clip_ckpt`` via the fuzzy
    torch-state-dict matcher; fails loud on missing weights/vocab."""
    import jax.numpy as jnp

    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict
    from fgdm_tpu.models.clip import CLIPTextEncoder, CLIPTokenizer
    from fgdm_tpu.utils.clip_score import CLIPScorer, CLIPVisionEncoder

    if not (opt.clip_ckpt and os.path.exists(opt.clip_ckpt)):
        raise SystemExit(
            "[eval] --clip_ckpt is required (CLIP score with random towers "
            "is meaningless); pass the OpenAI/HF CLIP checkpoint path")
    tok = CLIPTokenizer(vocab_dir=opt.vocab_dir)
    tok.check_production("eval")

    vision = CLIPVisionEncoder()
    text = CLIPTextEncoder()
    vparams, tparams, proj = ingest_clip_towers(
        load_torch_state_dict(opt.clip_ckpt), vision, text)
    return CLIPScorer(vparams, tparams, jnp.asarray(proj),
                      vision_def=vision, text_def=text), tok


def default_fid_backend(opt, scorer) -> Tuple[Callable, int, str]:
    if opt.inception_ckpt:
        if not os.path.exists(opt.inception_ckpt):
            raise SystemExit(
                f"[eval] --inception_ckpt {opt.inception_ckpt} not found")
        from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict
        from fgdm_tpu.utils.inception import (ingest_inception,
                                              inception_feature_fn)

        params = ingest_inception(load_torch_state_dict(opt.inception_ckpt))
        fn, dim = inception_feature_fn(params)
        return fn, dim, "inception_pool3"
    from fgdm_tpu.utils.fid import clip_feature_fn

    fn, dim = clip_feature_fn(scorer)
    return fn, dim, "clip"


def default_segmenter_factory(opt):
    """Build the mIoU re-annotator from ``--seg_ckpt`` → (labels_fn,
    num_classes, palette).  ``labels_fn`` maps [B,H,W,3] float [0,1] →
    [B,H,W] int32 ADE labels.  Fails loud without real weights — adherence
    scored by a random segmenter is meaningless."""
    import numpy as np

    if not (opt.seg_ckpt and os.path.exists(opt.seg_ckpt)):
        raise SystemExit(
            "[eval] --cond_dir needs --seg_ckpt (UniFormer weights) to "
            "re-segment generated images for mIoU")
    from fgdm_tpu.annotators.uniformer import load_uniformer
    from fgdm_tpu.data.colorize import ade_cmap

    try:
        det = load_uniformer(opt.seg_ckpt)
    except ValueError as e:
        raise SystemExit(f"[eval] {e}")

    def labels_fn(img01: np.ndarray) -> np.ndarray:
        return det.labels(
            (np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8))

    return labels_fn, det.model.num_classes, ade_cmap()[1:]


def _miou(opt, imgs, segmenter_factory) -> Tuple[float, int]:
    """Re-segment ``imgs`` and score against the ``--cond_dir`` maps."""
    import numpy as np

    from fgdm_tpu.utils.seg_metrics import (confusion_matrix,
                                            labels_from_colorized,
                                            miou_from_confusion)

    labels_fn, num_classes, cmap = segmenter_factory(opt)
    conds = _load_dir_images(opt.cond_dir, size=imgs.shape[1:3],
                             nearest=True)
    if len(conds) != len(imgs):
        raise SystemExit(
            f"[eval] {len(imgs)} images vs {len(conds)} condition maps — "
            "mIoU pairs them in sorted order")
    gt = labels_from_colorized(conds, cmap)
    cm = np.zeros((num_classes, num_classes), np.int64)
    for i in range(0, len(imgs), 8):
        pred = labels_fn(imgs[i:i + 8])
        cm += confusion_matrix(pred, gt[i:i + 8], num_classes)
    return miou_from_confusion(cm)


_MIDAS_MEMO: dict = {}


def _load_midas_det(opt, flag: str):
    if not (opt.midas_ckpt and os.path.exists(opt.midas_ckpt)):
        raise SystemExit(
            f"[eval] {flag} needs --midas_ckpt (MiDaS dpt_hybrid weights) "
            "to re-annotate generated images")
    if opt.midas_ckpt not in _MIDAS_MEMO:
        from fgdm_tpu.annotators.midas import load_midas

        try:
            _MIDAS_MEMO[opt.midas_ckpt] = load_midas(opt.midas_ckpt)
        except ValueError as e:
            raise SystemExit(f"[eval] {e}")
    return _MIDAS_MEMO[opt.midas_ckpt]


def _midas_input(img01):
    import jax
    import jax.numpy as jnp

    b = img01.shape[0]
    return jax.image.resize(
        jnp.asarray(img01, jnp.float32) * 2.0 - 1.0,
        (b, 384, 384, 3), "bilinear")


def default_depth_factory(opt):
    """--midas_ckpt → depth_fn: [B,H,W,3] float [0,1] → [B,H,W] relative
    inverse depth in [0,1] (MiDaS convention, run at 384²)."""
    import numpy as np

    det = _load_midas_det(opt, "--depth_dir")

    def depth_fn(img01: np.ndarray) -> np.ndarray:
        depth01, _ = det(_midas_input(img01))
        return np.asarray(depth01)

    return depth_fn


def default_normal_factory(opt):
    """--midas_ckpt → normal_fn: [B,H,W,3] float [0,1] → [B,H,W,3] normal
    vectors (MiDaS depth→normal, the condition-synthesis convention)."""
    import numpy as np

    det = _load_midas_det(opt, "--normal_dir")

    def normal_fn(img01: np.ndarray) -> np.ndarray:
        _, normal = det(_midas_input(img01))
        return np.asarray(normal)

    return normal_fn


def default_sketch_factory(opt):
    """--pidinet_ckpt → edge_fn: [B,H,W,3] float [0,1] → [B,H,W] edge
    probabilities in [0,1]."""
    import jax
    import numpy as np

    if not (opt.pidinet_ckpt and os.path.exists(opt.pidinet_ckpt)):
        raise SystemExit(
            "[eval] --sketch_dir needs --pidinet_ckpt (PiDiNet weights) "
            "to re-detect edges on generated images")
    from fgdm_tpu.annotators.pidinet import load_pidinet

    try:
        model, params = load_pidinet(opt.pidinet_ckpt)
    except ValueError as e:
        raise SystemExit(f"[eval] {e}")
    apply = jax.jit(model.apply)

    def edge_fn(img01: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        x = jnp.asarray(img01, jnp.float32) * 2.0 - 1.0
        # PiDiNet emits [-1,1] (the condition-image convention) → [0,1]
        return (np.asarray(apply(params, x))[..., 0] + 1.0) / 2.0

    return edge_fn


def default_pose_factory(opt):
    """--openpose_ckpt → pose_fn: [B,H,W,3] float [0,1] → [B,H,W,3]
    rendered skeleton maps in [0,1] (OpenPose re-detection; the network
    runs jitted, peak grouping is host-side per image)."""
    import numpy as np

    if not (opt.openpose_ckpt and os.path.exists(opt.openpose_ckpt)):
        raise SystemExit(
            "[eval] --pose_dir needs --openpose_ckpt (OpenPose body_pose "
            "weights) to re-detect poses on generated images")
    from fgdm_tpu.annotators.openpose import load_openpose

    try:
        det = load_openpose(opt.openpose_ckpt)
    except ValueError as e:
        raise SystemExit(f"[eval] {e}")

    def pose_fn(img01: np.ndarray) -> np.ndarray:
        renders = [
            det((np.clip(im, 0.0, 1.0) * 255).astype(np.uint8))
            for im in np.asarray(img01)
        ]
        return np.stack(renders).astype(np.float32) / 255.0

    return pose_fn


def _reannotate(opt, imgs, factory, cond_dir: str, what: str):
    """Shared re-annotation driver: run ``factory(opt)`` over ``imgs`` in
    batches and load+resize the requested maps to the prediction grid.
    Returns (pred, gt01) with matching shapes."""
    import numpy as np

    fn = factory(opt)
    conds = _load_dir_images(cond_dir)
    if len(conds) != len(imgs):
        raise SystemExit(
            f"[eval] {len(imgs)} images vs {len(conds)} {what} maps — "
            "adherence pairs them in sorted order")
    preds = []
    for i in range(0, len(imgs), 8):
        preds.append(np.asarray(fn(imgs[i:i + 8])))
    pred = np.concatenate(preds)
    if pred.shape[1:3] != conds.shape[1:3]:
        import jax
        import jax.numpy as jnp

        conds = np.asarray(jax.image.resize(
            jnp.asarray(conds),
            (conds.shape[0],) + pred.shape[1:3] + (conds.shape[-1],),
            "bilinear"))
    return pred, conds


def _depth(opt, imgs, depth_factory) -> dict:
    """Re-estimate depth from ``imgs`` and score vs ``--depth_dir`` maps."""
    from fgdm_tpu.utils.depth_metrics import depth_adherence

    pred, conds = _reannotate(opt, imgs, depth_factory, opt.depth_dir,
                              "depth")
    return depth_adherence(pred, conds.mean(-1))


def _generate(opt, tok) -> Tuple["np.ndarray", List[str]]:
    """Sample images for the prompts → ([N,H,W,3] in [0,1], prompts)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fgdm_tpu.checkpoint.loader import load_fgdm
    from fgdm_tpu.config import instantiate_from_config, load_config
    from fgdm_tpu.core.schedules import DDIMSchedule
    from fgdm_tpu.sampling.ddim import ddim_sample

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    spec = None
    if opt.config and os.path.exists(opt.config):
        spec = instantiate_from_config(load_config(opt.config)["model"],
                                       dtype=dtype)
    ckpt = opt.ckpt if (opt.ckpt and os.path.exists(opt.ckpt)) else None
    if opt.ckpt and ckpt is None:
        raise SystemExit(f"[eval] --ckpt {opt.ckpt} not found — metrics on "
                         "a random-init model are meaningless")
    ld = (spec.load(ckpt, dtype=dtype) if spec is not None
          else load_fgdm(ckpt, dtype=dtype, latent_size=opt.H // 8))

    if opt.from_file:
        with open(opt.from_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
    elif opt.prompt:
        prompts = [opt.prompt]
    else:
        raise SystemExit("[eval] need --prompt or --from-file (or "
                         "--images_dir to skip generation)")

    b = opt.n_samples
    sched = DDIMSchedule.create(ld.schedule, opt.ddim_steps)
    uc = ld.get_learned_conditioning(jnp.asarray(tok([""] * b)))
    shape = (b, opt.H // 8, opt.W // 8, ld.unet_def.in_channels)

    @jax.jit
    def sample(ld, rng, ctx):
        z, _ = ddim_sample(ld.denoise_fn(), rng, shape, sched,
                           {"c_crossattn": ctx}, {"c_crossattn": uc},
                           cfg_scale=opt.scale)
        return ld.decode_first_stage(z)

    rng = jax.random.PRNGKey(opt.seed)
    chunks = [prompts[i:i + b] for i in range(0, len(prompts), b)]
    imgs, used = [], []
    for pb in chunks:
        padded = pb + [pb[-1]] * (b - len(pb))
        rng, r = jax.random.split(rng)
        ctx = ld.get_learned_conditioning(jnp.asarray(tok(padded)))
        x = sample(ld, r, ctx)
        img01 = np.asarray(jnp.clip((x + 1.0) / 2.0, 0.0, 1.0),
                           np.float32)[: len(pb)]
        imgs.append(img01)
        used += pb
    out = np.concatenate(imgs)
    if opt.outdir:
        from PIL import Image

        os.makedirs(opt.outdir, exist_ok=True)
        for i, a in enumerate((out * 255).astype(np.uint8)):
            Image.fromarray(a).save(os.path.join(opt.outdir, f"{i:05}.png"))
    return out, used


def main(argv: Optional[Sequence[str]] = None,
         scorer_factory=default_scorer_factory,
         fid_backend_factory=default_fid_backend,
         segmenter_factory=default_segmenter_factory,
         depth_factory=default_depth_factory,
         normal_factory=default_normal_factory,
         sketch_factory=default_sketch_factory,
         pose_factory=default_pose_factory) -> dict:
    opt = get_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    # the CLIP towers are only needed for CLIP score, CLIP-FID, or
    # generation — an mIoU-only or Inception-FID run must not demand
    # --clip_ckpt
    _clip = {}

    def clip_backend():
        if not _clip:
            _clip["scorer"], _clip["tok"] = scorer_factory(opt)
        return _clip["scorer"], _clip["tok"]

    if opt.images_dir:
        imgs = _load_dir_images(opt.images_dir)
        prompts: List[str] = []
        if opt.from_file:
            with open(opt.from_file) as f:
                prompts = [l.strip() for l in f if l.strip()]
        elif opt.prompt:
            prompts = [opt.prompt] * len(imgs)
        if prompts and len(prompts) != len(imgs):
            raise SystemExit(
                f"[eval] {len(imgs)} images vs {len(prompts)} prompts — "
                "CLIP score needs one prompt per (sorted) image")
    else:
        imgs, prompts = _generate(opt, clip_backend()[1])

    if not (prompts or opt.ref_dir or opt.cond_dir or opt.depth_dir
            or opt.normal_dir or opt.sketch_dir or opt.pose_dir):
        raise SystemExit(
            "[eval] nothing to score: give prompts (--prompt/--from-file) "
            "for CLIP score, --ref_dir for FID, or a condition dir "
            "(--cond_dir/--depth_dir/--normal_dir/--sketch_dir/--pose_dir) "
            "for adherence metrics")

    metrics: dict = {"n_images": int(imgs.shape[0])}
    if prompts:
        scorer, tok = clip_backend()
        ids = jnp.asarray(tok(prompts))
        scores = []
        for i in range(0, len(prompts), 16):
            scores.append(np.asarray(scorer.score(
                jnp.asarray(imgs[i:i + 16]), ids[i:i + 16])))
        metrics["clip_score"] = float(np.mean(np.concatenate(scores)))

    if opt.ref_dir:
        from fgdm_tpu.utils.fid import compute_fid

        feat_fn, dim, backend = fid_backend_factory(
            opt, None if opt.inception_ckpt else clip_backend()[0])
        real = _load_dir_images(opt.ref_dir)

        def batches(arr, bs=16):
            for i in range(0, arr.shape[0], bs):
                yield arr[i:i + bs]

        metrics["fid"] = float(compute_fid(
            batches(real), batches(imgs), feat_fn, dim))
        metrics["fid_backend"] = backend

    if opt.cond_dir:
        miou, n_classes = _miou(opt, imgs, segmenter_factory)
        metrics["miou"] = miou
        metrics["miou_classes"] = n_classes

    if opt.depth_dir:
        metrics.update(_depth(opt, imgs, depth_factory))

    if opt.normal_dir:
        from fgdm_tpu.utils.depth_metrics import normal_angular_error

        pred, conds = _reannotate(opt, imgs, normal_factory,
                                  opt.normal_dir, "normal")
        metrics.update(normal_angular_error(pred, conds * 2.0 - 1.0))

    if opt.sketch_dir:
        from fgdm_tpu.utils.edge_metrics import edge_f1

        pred, conds = _reannotate(opt, imgs, sketch_factory,
                                  opt.sketch_dir, "sketch")
        metrics.update(edge_f1(pred, conds.mean(-1)))

    if opt.pose_dir:
        from fgdm_tpu.utils.pose_metrics import skeleton_f1

        pred, conds = _reannotate(opt, imgs, pose_factory,
                                  opt.pose_dir, "pose")
        metrics.update(skeleton_f1(pred, conds))

    line = json.dumps(metrics)
    print(line)
    if opt.out:
        with open(opt.out, "w") as f:
            f.write(line + "\n")
    return metrics


if __name__ == "__main__":
    main()
