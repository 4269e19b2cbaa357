"""Seg→image rendering CLI over a dataset of segmentation maps.

Flow parity with `/root/reference/controlnet/seg2image_inference.py:1-142`:
load the ControlNet stage, iterate a 'sample'-mode dataset directory
(``sample1/`` images, ``sample2/`` seg maps — or detect maps on the fly
with the UniFormer annotator), run 20-step DDIM at CFG 9.0 per map, save
renders.

Usage:
    python -m fgdm_tpu.cli.seg2image --data_dir data/samples \
        --cn_ckpt models/fgdm_control_sd15_seg.pth --prompt "a photo"
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="seg→image (ControlNet) renderer")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--config", type=str, default=None,
                   help="cldm yaml (reference models/cldm_v15_*.yaml); "
                        "default = SD-1.5 ControlLDM layout")
    p.add_argument("--outdir", type=str, default="outputs/seg2image")
    p.add_argument("--cn_ckpt", type=str, default=None)
    p.add_argument("--prompt", type=str, default="")
    p.add_argument("--a_prompt", type=str,
                   default="best quality, extremely detailed")
    p.add_argument("--n_prompt", type=str,
                   default="longbody, lowres, bad anatomy, bad hands, "
                           "missing fingers, extra digit, fewer digits, "
                           "cropped, worst quality, low quality")
    p.add_argument("--ddim_steps", type=int, default=20)
    p.add_argument("--scale", type=float, default=9.0)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--eta", type=float, default=0.0,
                   help="DDIM eta (reference process() slider default 0.0)")
    p.add_argument("--detect_resolution", type=int, default=512,
                   help="resolution the detector runs at")
    p.add_argument("--guess_mode", action="store_true")
    p.add_argument("--image_resolution", type=int, default=512)
    p.add_argument("--num_images", type=int, default=-1)
    p.add_argument("--detect", action="store_true",
                   help="run the UniFormer annotator on sample1 images "
                        "instead of using sample2 maps")
    p.add_argument("--seg_ckpt", type=str, default=None,
                   help="UniFormer weights for --detect (upernet_global_"
                        "small torch ckpt); without it the detector is "
                        "random-init (debug only)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--precision", type=str, default="autocast")
    return p


def main(argv=None):
    opt = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fgdm_tpu.checkpoint.loader import load_controlnet
    from fgdm_tpu.data.dataset import list_image_files
    from fgdm_tpu.models.clip import CLIPTokenizer
    from fgdm_tpu.models.controlnet import guess_mode_scales
    from fgdm_tpu.sampling.chain import sample_image_factor

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    os.makedirs(opt.outdir, exist_ok=True)

    cn_ckpt = opt.cn_ckpt if opt.cn_ckpt and os.path.exists(opt.cn_ckpt) \
        else None
    if opt.config:
        from fgdm_tpu.config import instantiate_from_config, load_config

        spec = instantiate_from_config(load_config(opt.config)["model"],
                                       dtype=dtype)
        cldm = spec.load(cn_ckpt, dtype=dtype)
    else:
        cldm = load_controlnet(cn_ckpt, dtype=dtype,
                               latent_size=opt.image_resolution // 8)
    if opt.guess_mode:
        cldm = cldm.replace(
            control_scales=guess_mode_scales(opt.strength))
    elif opt.strength != 1.0:
        cldm = cldm.replace(control_scales=(opt.strength,) * 13)

    tok = CLIPTokenizer()
    if cn_ckpt is not None:
        tok.check_production("seg2image")
    full_prompt = (opt.prompt + ", " + opt.a_prompt) if opt.prompt \
        else opt.a_prompt
    ctx = cldm.get_learned_conditioning(jnp.asarray(tok([full_prompt])))
    uc = cldm.get_learned_conditioning(jnp.asarray(tok([opt.n_prompt])))

    seg_dir = os.path.join(opt.data_dir, "sample2")
    img_dir = os.path.join(opt.data_dir, "sample1")
    files = list_image_files(seg_dir if os.path.isdir(seg_dir) else
                             opt.data_dir)
    if opt.detect:
        files = list_image_files(img_dir)
    if opt.num_images > 0:
        files = files[: opt.num_images]

    detector = None
    if opt.detect:
        from fgdm_tpu.annotators.uniformer import (UniFormerSeg,
                                                   UniformerDetector,
                                                   load_uniformer)

        if opt.seg_ckpt:
            detector = load_uniformer(opt.seg_ckpt,
                                      input_size=opt.detect_resolution,
                                      dtype=dtype)
        else:
            seg_model = UniFormerSeg(dtype=dtype)
            params = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(lambda: seg_model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 512, 512, 3)))),
            )
            detector = UniformerDetector(params, seg_model,
                                         input_size=opt.detect_resolution)
            print("[seg2image] NOTE: UniFormer weights are random-init — "
                  "pass --seg_ckpt or precomputed maps for real use")

    run = jax.jit(
        lambda cldm, hint, rng: cldm.decode_first_stage(
            sample_image_factor(cldm, rng, hint, ctx, uc,
                                num_steps=opt.ddim_steps,
                                cfg_scale=opt.scale, eta=opt.eta,
                                strength=opt.strength,
                                guess_mode=opt.guess_mode))
    )

    rng = jax.random.PRNGKey(opt.seed)
    R = opt.image_resolution
    for i, path in enumerate(files):
        img = Image.open(path).convert("RGB").resize((R, R), Image.NEAREST)
        arr = np.asarray(img)
        if detector is not None:
            # detector runs at detect_resolution, result upsampled to R
            # (reference process(), seg2image_inference.py:43-60)
            D = opt.detect_resolution
            if D != R:
                arr = np.asarray(Image.fromarray(arr).resize(
                    (D, D), Image.BILINEAR))
            arr = detector(arr)
            if D != R:
                arr = np.asarray(Image.fromarray(arr).resize(
                    (R, R), Image.NEAREST))
        hint = jnp.asarray(arr, jnp.float32)[None] / 255.0
        rng, step_rng = jax.random.split(rng)
        out = run(cldm, hint, step_rng)
        out8 = np.asarray(jnp.clip((out + 1) / 2, 0, 1) * 255).astype(np.uint8)
        name = os.path.splitext(os.path.basename(path))[0]
        Image.fromarray(out8[0]).save(
            os.path.join(opt.outdir, f"{name}_render.png"))
        print(f"[{i + 1}/{len(files)}] {name}")
    print(f"Renders written to {opt.outdir}")


if __name__ == "__main__":
    main()
