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
    """[S,B,H,W,C] intermediates → one grid row per sample."""
    S, B = x_inter.shape[:2]
    imgs = []
    for b in range(B):
        for s in range(S):
            frame = x_inter[s, b]
            if decode_fn is not None:
                frame = np.asarray(decode_fn(frame[None]))[0]
            imgs.append(to_uint8(frame))
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
            arr = np.asarray(arr)[: self.max_images]
            if arr.dtype != np.uint8:
                arr = to_uint8(arr)
            grid = make_grid(arr)
            Image.fromarray(grid.squeeze() if grid.shape[-1] == 1 else grid
                            ).save(
                os.path.join(self.dir, f"{key}_gs-{step:06}.png"))


def log_images(
    ld,
    batch: Dict[str, np.ndarray],
    rng,
    n: int = 4,
    ddim_steps: int = 50,
    cfg_scale: float = 7.5,
    sample: bool = True,
) -> Dict[str, np.ndarray]:
    """Model-level diagnostics dict (reference ``log_images``,
    ddpm.py:1466-1599): inputs, VAE reconstruction, CFG samples."""
    import jax
    import jax.numpy as jnp

    from fgdm_tpu.core.schedules import DDIMSchedule
    from fgdm_tpu.sampling.ddim import ddim_sample

    out: Dict[str, np.ndarray] = {}
    img = jnp.asarray(batch["image"][:n])
    out["inputs"] = np.asarray(img)
    z = ld.encode_first_stage(img)
    out["reconstruction"] = np.asarray(ld.decode_first_stage(z))
    if sample and "input_ids" in batch:
        ctx = ld.get_learned_conditioning(jnp.asarray(batch["input_ids"][:n]))
        uc = ld.get_learned_conditioning(
            jnp.zeros_like(jnp.asarray(batch["input_ids"][:n])))
        sched = DDIMSchedule.create(ld.schedule, ddim_steps)
        zs, _ = ddim_sample(
            ld.denoise_fn(), rng, z.shape, sched,
            {"c_crossattn": ctx}, {"c_crossattn": uc}, cfg_scale=cfg_scale,
        )
        out["samples"] = np.asarray(ld.decode_first_stage(zs))
    return out
