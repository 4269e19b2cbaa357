"""Metrics, image logging, and visualization — the observability layer.

Replaces the reference's TestTube/W&B + ImageLogger stack
(`/root/reference/main.py:313-417,566-590`; ``log_images`` diagnostics
`ldm/models/diffusion/ddpm.py:1466-1599`):

* ``MetricsWriter`` — append-only JSONL per run (train/val prefixed scalars,
  step + wall time), cheap enough to call every step.
* ``ImageLogger`` — every N steps decodes inputs/reconstruction/samples and
  writes PNG grids under ``<logdir>/images`` (rank-0 only on multihost).
* ``make_grid`` / ``denoise_row`` — grid assembly for diffusion-row and
  denoise-row diagnostics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, logdir: str, filename: str = "metrics.jsonl"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, filename)
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = ""):
        row = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            key = f"{prefix}/{k}" if prefix else k
            try:
                row[key] = float(v)
            except (TypeError, ValueError):
                continue
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float → uint8."""
    return (np.clip((np.asarray(img) + 1.0) / 2.0, 0, 1) * 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 4, pad: int = 2) -> np.ndarray:
    """[N,H,W,C] uint8 → single grid image."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.full(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), 255, np.uint8
    )
    for i, img in enumerate(images):
        r, cl = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + cl * (w + pad)
        grid[y:y + h, x:x + w] = img
    return grid


def denoise_row_grid(x_inter: np.ndarray, decode_fn=None) -> np.ndarray:
    """[S,B,H,W,C] intermediates → one grid row per sample.

    All S·B frames decode in ONE batched call — per-frame batch-1 decodes
    cost ~50 separate eager VAE dispatches per log step."""
    S, B = x_inter.shape[:2]
    frames = np.asarray(x_inter)
    if decode_fn is not None:
        flat = np.asarray(decode_fn(
            frames.reshape((S * B,) + frames.shape[2:])))
        frames = flat.reshape((S, B) + flat.shape[1:])
    imgs = [to_uint8(frames[s, b]) for b in range(B) for s in range(S)]
    return make_grid(np.stack(imgs), nrow=S)


class ImageLogger:
    """Every ``batch_frequency`` steps, dump input/recon/sample grids
    (reference ImageLogger semantics, main.py:313-417)."""

    def __init__(self, logdir: str, batch_frequency: int = 800,
                 max_images: int = 8, is_main_process: bool = True):
        self.dir = os.path.join(logdir, "images")
        os.makedirs(self.dir, exist_ok=True)
        self.freq = batch_frequency
        self.max_images = max_images
        self.is_main = is_main_process

    def should_log(self, step: int) -> bool:
        return self.is_main and step % self.freq == 0

    def log(self, step: int, images: Dict[str, np.ndarray]):
        from PIL import Image

        for key, arr in images.items():
            arr = np.asarray(arr)
            if arr.ndim == 3:  # *_row keys arrive as a pre-assembled grid
                grid = arr if arr.dtype == np.uint8 else to_uint8(arr)
            else:
                arr = arr[: self.max_images]
                if arr.dtype != np.uint8:
                    arr = to_uint8(arr)
                grid = make_grid(arr)
            Image.fromarray(grid.squeeze() if grid.shape[-1] == 1 else grid
                            ).save(
                os.path.join(self.dir, f"{key}_gs-{step:06}.png"))


def log_txt_as_img(wh, captions: Iterable[str]) -> np.ndarray:
    """Render captions onto white tiles (reference ``log_txt_as_img``,
    `ldm/util.py:22-41`) → [-1,1] float [B,H,W,3]."""
    from PIL import Image, ImageDraw

    w, h = wh
    tiles = []
    for cap in captions:
        img = Image.new("RGB", (w, h), "white")
        draw = ImageDraw.Draw(img)
        nc = max(int(10 * (w / 256)), 1)
        lines = "\n".join(
            str(cap)[i:i + nc] for i in range(0, len(str(cap)), nc))
        draw.text((0, 0), lines, fill="black")
        tiles.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(tiles)


def log_images(
    ld,
    batch: Dict[str, np.ndarray],
    rng,
    n: int = 4,
    ddim_steps: int = 50,
    cfg_scale: float = 7.5,
    sample: bool = True,
    inpaint: bool = False,
    plot_denoise_rows: bool = False,
    plot_progressive_rows: bool = False,
    plot_diffusion_rows: bool = False,
    n_diffusion_steps: int = 8,
) -> Dict[str, np.ndarray]:
    """Model-level diagnostics dict (reference ``log_images``,
    ddpm.py:1466-1599).

    Always: ``inputs``, ``reconstruction``, and ``conditioning`` (captions
    rendered as image tiles) when the batch carries captions.  Optional,
    matching the reference's flags:

    * ``plot_diffusion_rows`` — forward q_sample noising progression grid.
    * ``sample`` — CFG ``samples``; with ``plot_denoise_rows`` also a
      ``denoise_row`` grid of intermediate x states.
    * ``inpaint`` — ``samples_inpainting``/``mask`` (center-square hole) and
      ``samples_outpainting``; the sampler path is the mask/x0 compositing
      in :func:`fgdm_tpu.sampling.ddim.ddim_sample`.  (The reference runs
      its *outpaint* block with the same mask as inpaint — a visible slip,
      ddpm.py:1583-1588; here outpainting inverts the mask.)
    * ``plot_progressive_rows`` — ``progressive_row`` from the x̂₀
      trajectory (the reference's progressive_denoising x0_partial rows).
    """
    import jax
    import jax.numpy as jnp

    from fgdm_tpu.core.schedules import DDIMSchedule
    from fgdm_tpu.sampling.ddim import ddim_sample

    out: Dict[str, np.ndarray] = {}
    img = jnp.asarray(batch["image"][:n])
    out["inputs"] = np.asarray(img)
    z = ld.encode_first_stage(img)
    out["reconstruction"] = np.asarray(ld.decode_first_stage(z))
    caps = batch.get("captions")
    if caps is None:
        caps = batch.get("caption")
    if caps is not None:
        out["conditioning"] = log_txt_as_img(
            (img.shape[2], img.shape[1]), list(caps)[:n])

    if plot_diffusion_rows:
        # forward-noising progression: q_sample at evenly spaced t
        # (reference ddpm.py:1512-1529)
        T = int(ld.schedule.num_timesteps)
        ts = np.linspace(0, T - 1, n_diffusion_steps).astype(np.int32)
        rng, drng = jax.random.split(rng)
        noise = jax.random.normal(drng, z.shape, jnp.float32)
        frames = [
            np.asarray(ld.decode_first_stage(ld.schedule.q_sample(
                z, jnp.full((z.shape[0],), int(t), jnp.int32), noise)))
            for t in ts
        ]
        # [S,B,H,W,C] → one row per sample
        out["diffusion_row"] = denoise_row_grid(np.stack(frames))

    have_ctx = "input_ids" in batch
    if have_ctx:
        ctx = ld.get_learned_conditioning(jnp.asarray(batch["input_ids"][:n]))
        uc = ld.get_learned_conditioning(
            jnp.zeros_like(jnp.asarray(batch["input_ids"][:n])))
        sched = DDIMSchedule.create(ld.schedule, ddim_steps)

    if sample and have_ctx:
        log_every = max(ddim_steps // 8, 1) if (
            plot_denoise_rows or plot_progressive_rows) else 0
        rng, srng = jax.random.split(rng)
        zs, inter = ddim_sample(
            ld.denoise_fn(), srng, z.shape, sched,
            {"c_crossattn": ctx}, {"c_crossattn": uc}, cfg_scale=cfg_scale,
            log_every_t=log_every,
        )
        out["samples"] = np.asarray(ld.decode_first_stage(zs))
        if plot_denoise_rows:
            out["denoise_row"] = denoise_row_grid(
                np.asarray(inter["x_inter"]),
                decode_fn=ld.decode_first_stage)
        if plot_progressive_rows:
            out["progressive_row"] = denoise_row_grid(
                np.asarray(inter["pred_x0"]),
                decode_fn=ld.decode_first_stage)

    if inpaint and have_ctx:
        # center-square hole in latent space (reference ddpm.py:1566-1588);
        # mask=1 marks kept regions
        b, h, w = z.shape[0], z.shape[1], z.shape[2]
        mask = np.ones((b, h, w, 1), np.float32)
        mask[:, h // 4: 3 * h // 4, w // 4: 3 * w // 4] = 0.0
        mask = jnp.asarray(mask)
        rng, r_in, r_out = jax.random.split(rng, 3)
        z_in, _ = ddim_sample(
            ld.denoise_fn(), r_in, z.shape, sched,
            {"c_crossattn": ctx}, {"c_crossattn": uc}, cfg_scale=cfg_scale,
            mask=mask, x0=z, schedule=ld.schedule,
        )
        out["samples_inpainting"] = np.asarray(ld.decode_first_stage(z_in))
        out["mask"] = np.asarray(mask) * 2.0 - 1.0  # to_uint8 expects [-1,1]
        z_out, _ = ddim_sample(
            ld.denoise_fn(), r_out, z.shape, sched,
            {"c_crossattn": ctx}, {"c_crossattn": uc}, cfg_scale=cfg_scale,
            mask=1.0 - mask, x0=z, schedule=ld.schedule,
        )
        out["samples_outpainting"] = np.asarray(ld.decode_first_stage(z_out))
    return out
