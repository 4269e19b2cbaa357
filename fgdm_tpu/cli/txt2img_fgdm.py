"""FG-DM chain inference CLI — flag-compatible with the reference's
`scripts/txt2img_fgdm_inference.py:41-171` (driven by `run_inference.sh`).

Flow parity (reference `:176-301`): load the FG-DM condition-factor model
from ``--config``/``--ckpt``; sample ``--n_samples`` condition maps with
DDIM/PLMS at ``--H×--W`` and CFG ``--scale``; save the maps; when
``--use_controlnet``, render each map to a 512² image with the ControlNet
stage (20-step DDIM, CFG 9.0, the reference's positive/negative prompt
suffixes).  Unlike the reference, the factor hop stays on device — no PNG
round trip between models.

Usage:
    python -m fgdm_tpu.cli.txt2img_fgdm --prompt "..." --config models/config.yaml \
        --ckpt models/fgdm_seg.pth --n_samples 5 --ddim_steps 50 --use_controlnet
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="FG-DM chain inference (TPU)")
    p.add_argument("--prompt", type=str, nargs="?",
                   default="a painting of a virus monster playing guitar")
    p.add_argument("--config", type=str,
                   default="configs/stable-diffusion/v1-inference.yaml")
    p.add_argument("--use_controlnet", action="store_true",
                   help="run the seg→image ControlNet second factor")
    p.add_argument("--outdir", type=str, default="outputs/txt2img-samples")
    p.add_argument("--cond", type=str, default="seg",
                   choices=["seg", "depth", "normal", "sketch"])
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--n_prompt", type=str, default="")
    p.add_argument("--plms", action="store_true")
    p.add_argument("--dpm", "--dpm_solver", dest="dpm", action="store_true",
                   help="DPM-Solver++ sampler (extension)")
    p.add_argument("--fixed_code", action="store_true")
    p.add_argument("--resize", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_iter", type=int, default=1)
    p.add_argument("--H", type=int, default=256)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--ckpt", type=str,
                   default="models/ldm/stable-diffusion-v1/model.ckpt")
    p.add_argument("--cn_ckpt", type=str, default=None,
                   help="ControlNet stage checkpoint "
                        "(default models/fgdm_control_sd15_<cond>.pth)")
    p.add_argument("--n_samples", type=int, default=4)
    p.add_argument("--C", type=int, default=4)
    p.add_argument("--f", type=int, default=8,
                   help="VAE downsample factor (latent = H/f)")
    p.add_argument("--skip_grid", action="store_true",
                   help="do not save the sample grid")
    p.add_argument("--skip_save", action="store_true",
                   help="do not save individual samples")
    p.add_argument("--scale", type=float, default=7.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--precision", type=str, default="autocast",
                   choices=["autocast", "full"])
    p.add_argument("--vocab_dir", type=str, default=None,
                   help="dir with CLIP vocab.json+merges.txt")
    # txt2img.py parity extras (scripts/txt2img.py:98-439)
    p.add_argument("--use_original", action="store_true",
                   help="frozen-SD teacher path (adapter disabled)")
    p.add_argument("--from-file", dest="from_file", type=str, default=None,
                   help="file with one prompt per line")
    p.add_argument("--n_rows", type=int, default=0,
                   help="grid row count (0 = no grid)")
    p.add_argument("--inference_loss", action="store_true",
                   help="attention-alignment guidance inside DDIM "
                        "(reference ddim.py:190-191,288-376)")
    # N-factor chain (BASELINE #3; reference multi-adapter composition,
    # scripts/txt2img.py:370-394)
    p.add_argument("--factors", type=str, default=None,
                   help="comma list of condition factors to chain, e.g. "
                        "'seg,depth,normal' — each factor is adapter-"
                        "prompted by the previous one; the last map drives "
                        "the ControlNet stage")
    p.add_argument("--factor_ckpts", type=str, default=None,
                   help="comma list of per-factor checkpoints (default "
                        "models/fgdm_<factor>.pth)")
    p.add_argument("--all_pconds", action="store_true",
                   help="multi-adapter composition: every earlier factor "
                        "feeds an extra adapter of each later factor "
                        "(reference AdaptUNetModel, openaimodel.py:1291-1309)")
    return p


def _run_factor_chain(opt, spec, dtype):
    """N-factor product path: text→factor₁→…→factorₙ(→image), one traced
    program (``sampling.chain.fgdm_chain_n``; reference composes factors via
    separate script invocations + multi-adapter prompting,
    `scripts/txt2img.py:370-394`)."""
    import jax
    import jax.numpy as jnp

    from fgdm_tpu.checkpoint.loader import (load_controlnet, load_fgdm,
                                            sd_unet)
    from fgdm_tpu.models.clip import CLIPTokenizer
    from fgdm_tpu.sampling import chain as chain_mod

    names = [s.strip() for s in opt.factors.split(",") if s.strip()]
    if not names:
        raise SystemExit("--factors given but empty")
    if opt.factor_ckpts:
        cks = [c.strip() or None for c in opt.factor_ckpts.split(",")]
        if len(cks) != len(names):
            raise SystemExit(
                f"--factor_ckpts has {len(cks)} entries for "
                f"{len(names)} factors")
    else:
        cks = [f"models/fgdm_{n}.pth" for n in names]

    factors = []
    for k, (name, ck) in enumerate(zip(names, cks)):
        ck = ck if (ck and os.path.exists(ck)) else None
        if ck is None:
            print(f"[txt2img_fgdm] factor '{name}': ckpt missing — "
                  "random init")
        # with --all_pconds factor k needs k-1 extra adapters (every earlier
        # factor feeds one); ingest fills adapters absent from the ckpt from
        # module init
        n_prompts = max(1, k) if opt.all_pconds else 1
        if spec is not None:
            unet_def = (spec.unet_def.clone(num_prompts=n_prompts)
                        if n_prompts > 1 else spec.unet_def)
            ld_k = load_fgdm(
                ck, dtype=dtype, latent_size=spec.image_size,
                unet=unet_def, vae=spec.vae_def, clip=spec.clip_def,
                schedule=spec.schedule(), scale_factor=spec.scale_factor,
                conditioning_key=spec.conditioning_key)
        else:
            ld_k = load_fgdm(ck, dtype=dtype, latent_size=opt.H // opt.f,
                             unet=sd_unet(dtype=dtype,
                                          num_prompts=n_prompts))
        factors.append(ld_k)

    tok = CLIPTokenizer(vocab_dir=opt.vocab_dir)
    b = opt.n_samples
    # '|' splits per-factor prompts; a single prompt drives every factor
    prompts = [s.strip() for s in opt.prompt.split("|")]
    prompts = (prompts + [prompts[-1]] * len(names))[: len(names)]
    factor_ctxs = [
        ld_k.get_learned_conditioning(jnp.asarray(tok([p] * b)))
        for ld_k, p in zip(factors, prompts)
    ]
    empty_ctx = factors[0].get_learned_conditioning(
        jnp.asarray(tok([opt.n_prompt] * b)))

    cldm = cn_ctx = cn_neg = None
    if opt.use_controlnet:
        cn_ckpt = opt.cn_ckpt or f"models/fgdm_control_sd15_{names[-1]}.pth"
        cn_ckpt = cn_ckpt if os.path.exists(cn_ckpt) else None
        cldm = load_controlnet(cn_ckpt, dtype=dtype, share_first_stage=None)
        cn_ctx = cldm.get_learned_conditioning(jnp.asarray(
            tok([prompts[0] + ", " + chain_mod.A_PROMPT] * b)))
        cn_neg = cldm.get_learned_conditioning(
            jnp.asarray(tok([chain_mod.N_PROMPT] * b)))

    image_hw = (512, 512) if opt.use_controlnet else (opt.H, opt.W)

    sampler = "plms" if opt.plms else ("dpm" if opt.dpm else "ddim")

    @jax.jit
    def run(factors, cldm, rng, factor_ctxs, empty_ctx, cn_ctx, cn_neg):
        return chain_mod.fgdm_chain_n(
            factors, cldm, rng, factor_ctxs, empty_ctx,
            cn_prompt_ctx=cn_ctx, cn_neg_ctx=cn_neg,
            cond_hw=(opt.H, opt.W), image_hw=image_hw,
            factor_steps=opt.ddim_steps, factor_scale=opt.scale,
            all_pconds=opt.all_pconds, factor_sampler=sampler,
        )

    os.makedirs(opt.outdir, exist_ok=True)
    from PIL import Image

    rng = jax.random.PRNGKey(opt.seed)
    for it in range(opt.n_iter):
        rng, r = jax.random.split(rng)
        t0 = time.perf_counter()
        out = run(factors, cldm, r, factor_ctxs, empty_ctx, cn_ctx, cn_neg)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"[chain_n] {len(names)} factors"
              f"{' + image' if cldm is not None else ''}: {b} samples in "
              f"{dt:.2f}s ({b / dt:.3f} img/s)")
        for name, cond in zip(names, out["conditions"]):
            d = os.path.join(opt.outdir, f"factor_{name}")
            os.makedirs(d, exist_ok=True)
            arr = np.asarray(cond * 255).astype(np.uint8)
            for i, a in enumerate(arr):
                Image.fromarray(a).save(
                    os.path.join(d, f"{name}_{it:02}_{i:04}.png"))
        if out["image"] is not None:
            d = os.path.join(opt.outdir, f"{names[-1]}_images")
            os.makedirs(d, exist_ok=True)
            arr = np.asarray(
                jnp.clip((out["image"] + 1) / 2, 0, 1) * 255).astype(np.uint8)
            for i, a in enumerate(arr):
                Image.fromarray(a).save(
                    os.path.join(d, f"image_{it:02}_{i:04}.png"))
    print(f"Samples written to {opt.outdir}")


def main(argv=None):
    opt = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from fgdm_tpu.checkpoint.loader import load_controlnet, load_fgdm
    from fgdm_tpu.config import instantiate_from_config, load_config
    from fgdm_tpu.core.schedules import DDIMSchedule
    from fgdm_tpu.models.clip import CLIPTokenizer
    from fgdm_tpu.sampling import chain as chain_mod
    from fgdm_tpu.sampling.ddim import ddim_sample
    from fgdm_tpu.sampling.dpm_solver import dpm_solver_sample
    from fgdm_tpu.sampling.plms import plms_sample

    dtype = jnp.float32 if opt.precision == "full" else jnp.bfloat16
    os.makedirs(opt.outdir, exist_ok=True)
    sample_path = os.path.join(opt.outdir, "samples")
    os.makedirs(os.path.join(sample_path, "sample1"), exist_ok=True)

    # -- model assembly ----------------------------------------------------
    spec = None
    if opt.config and os.path.exists(opt.config):
        cfg = load_config(opt.config)
        spec = instantiate_from_config(cfg["model"], dtype=dtype)

    if opt.factors:
        return _run_factor_chain(opt, spec, dtype)

    ckpt = opt.ckpt if os.path.exists(opt.ckpt) else None
    if ckpt is None:
        print(f"[txt2img_fgdm] ckpt {opt.ckpt} not found — random init")
    if spec is not None:
        # honor the parsed config's module defs/schedule/scale_factor
        ld = spec.load(ckpt, dtype=dtype)
    else:
        ld = load_fgdm(ckpt, dtype=dtype, latent_size=opt.H // opt.f)

    tok = CLIPTokenizer(vocab_dir=opt.vocab_dir)
    if ckpt is not None:
        tok.check_production("txt2img_fgdm")
    b = opt.n_samples
    if opt.from_file:
        # per-prompt batch loop, chunked to the sample batch size
        # (reference scripts/txt2img.py:337-394); the last chunk is padded
        # by repetition to keep the compiled shape static.
        with open(opt.from_file) as f:
            prompts = [l.strip() for l in f if l.strip()]
        if not prompts:
            raise SystemExit(f"--from-file {opt.from_file} has no prompts")
        prompt_batches = [prompts[i:i + b] for i in range(0, len(prompts), b)]
        prompt_batches = [pb + [pb[-1]] * (b - len(pb))
                          for pb in prompt_batches]
    else:
        prompt_batches = [[opt.prompt] * b]
    empty_ids = jnp.asarray(tok([opt.n_prompt] * b))
    uc = ld.get_learned_conditioning(empty_ids)

    rng = jax.random.PRNGKey(opt.seed)
    shape = (b, opt.H // opt.f, opt.W // opt.f, opt.C)
    sched = DDIMSchedule.create(ld.schedule, opt.ddim_steps, eta=opt.ddim_eta)

    x_T = None
    if opt.fixed_code:
        rng, code_rng = jax.random.split(rng)
        x_T = jax.random.normal(code_rng, shape, jnp.float32)

    uncond = {"c_crossattn": uc}

    adapter_on = not opt.use_original

    @jax.jit
    def sample_f1(ld, rng, cond):
        fn = ld.denoise_fn(adapter_on=adapter_on)
        if opt.plms:
            z, _ = plms_sample(fn, rng, shape, sched, cond,
                               uncond, cfg_scale=opt.scale, x_T=x_T)
        elif opt.dpm:
            z = dpm_solver_sample(fn, rng, shape, ld.schedule,
                                  cond, uncond, cfg_scale=opt.scale,
                                  steps=opt.ddim_steps, x_T=x_T)
        else:
            gfn = (ld.capture_fn(adapter_on=adapter_on)
                   if opt.inference_loss else None)
            z, _ = ddim_sample(fn, rng, shape, sched, cond,
                               uncond, cfg_scale=opt.scale, x_T=x_T,
                               guidance_fn=gfn)
        return z, ld.decode_first_stage(z)

    cldm = None
    if opt.use_controlnet:
        cn_ckpt = opt.cn_ckpt or f"models/fgdm_control_sd15_{opt.cond}.pth"
        cn_ckpt = cn_ckpt if os.path.exists(cn_ckpt) else None
        cldm = load_controlnet(cn_ckpt, dtype=dtype, share_first_stage=None)
        cn_neg_ids = jnp.asarray(tok([chain_mod.N_PROMPT] * b))
        cn_uncond = cldm.get_learned_conditioning(cn_neg_ids)

        @jax.jit
        def sample_f2(cldm, hint, rng, cn_ctx):
            z = chain_mod.sample_image_factor(
                cldm, rng, hint, cn_ctx, cn_uncond, num_steps=20,
                cfg_scale=9.0
            )
            return cldm.decode_first_stage(z)

    from PIL import Image

    for it in range(opt.n_iter):
        for pi, pbatch in enumerate(prompt_batches):
            rng, f1_rng, f2_rng = jax.random.split(rng, 3)
            cond = {"c_crossattn": ld.get_learned_conditioning(
                jnp.asarray(tok(pbatch)))}
            t0 = time.perf_counter()
            z, cond_img = sample_f1(ld, f1_rng, cond)
            cond_img.block_until_ready()
            t1 = time.perf_counter()
            print(f"[factor1] {b} maps in {t1 - t0:.2f}s "
                  f"({b / (t1 - t0):.3f} img/s)")

            tag = f"{it:02}_{pi:02}" if len(prompt_batches) > 1 else f"{it:02}"
            cond01 = np.asarray(
                jnp.clip((cond_img + 1.0) / 2.0, 0, 1) * 255
            ).astype(np.uint8)
            if opt.n_rows > 0 and not opt.skip_grid:
                from fgdm_tpu.train.metrics import make_grid

                Image.fromarray(make_grid(cond01, nrow=opt.n_rows)).save(
                    os.path.join(sample_path, f"grid_{tag}.png"))
            for i, arr in enumerate(cond01 if not opt.skip_save else []):
                im = Image.fromarray(arr)
                if opt.resize:
                    im = im.resize((512, 512))
                im.save(os.path.join(sample_path, "sample1",
                                     f"sample1_{tag}_{i:04}.png"))

            if cldm is not None:
                cn_ctx = cldm.get_learned_conditioning(jnp.asarray(
                    tok([p + ", " + chain_mod.A_PROMPT for p in pbatch])))
                hint = chain_mod.latent_to_condition_image(ld, z, (512, 512))
                t2 = time.perf_counter()
                img = sample_f2(cldm, hint, f2_rng, cn_ctx)
                img.block_until_ready()
                t3 = time.perf_counter()
                print(f"[factor2] {b} images in {t3 - t2:.2f}s "
                      f"({b / (t3 - t2):.3f} img/s)")
                out_dir = os.path.join(sample_path, f"{opt.cond}_images")
                os.makedirs(out_dir, exist_ok=True)
                arr = np.asarray(
                    jnp.clip((img + 1) / 2, 0, 1) * 255).astype(np.uint8)
                for i, a in enumerate(arr):
                    Image.fromarray(a).save(
                        os.path.join(out_dir, f"sample1_{tag}_{i:04}.png"))

    print(f"Samples written to {opt.outdir}")


if __name__ == "__main__":
    main()
