"""VQ model, perceptual losses, encoder zoo tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.perceptual_losses import (
    LPIPS,
    PatchDiscriminator,
    generator_loss,
    hinge_d_loss,
    vanilla_d_loss,
)
from fgdm_tpu.models.encoders import (
    BERTEmbedder,
    ClassEmbedder,
    FrozenClipImageEmbedder,
    SpatialRescaler,
)
from fgdm_tpu.models.vq import VectorQuantizer, VQModel


def test_vector_quantizer_straight_through():
    vq = VectorQuantizer(n_embed=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    (z_q, loss, idx), _ = vq.apply(params, z, mutable=[])
    assert z_q.shape == z.shape and idx.shape == (2, 4, 4)
    assert float(loss) >= 0
    # straight-through: grad wrt z is identity-like (nonzero)
    g = jax.grad(lambda z: jnp.sum(vq.apply(params, z)[0]))(z)
    assert float(jnp.abs(g).sum()) > 0


def test_vq_model_roundtrip():
    vq = VQModel(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
                 n_embed=32, embed_dim=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vq.init(jax.random.PRNGKey(1), x)
    recon, emb_loss = vq.apply(params, x)
    assert recon.shape == x.shape
    # interface path: encode continuous then quantize-at-decode
    h = vq.apply(params, x, method=VQModel.encode_pre_quant)
    out = vq.apply(params, h, method=VQModel.decode_pre_quant)
    assert out.shape == x.shape


def test_lpips_and_gan_losses():
    lpips = LPIPS()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3)) * 0.1
    params = lpips.init(jax.random.PRNGKey(1), x, x)
    d_same = lpips.apply(params, x, x)
    d_diff = lpips.apply(params, x, -x)
    assert float(d_same[0]) < float(d_diff[0])

    disc = PatchDiscriminator(ndf=16, dtype=jnp.float32)
    dp = disc.init(jax.random.PRNGKey(2), x)
    logits = disc.apply(dp, x)
    assert logits.shape[0] == 1 and logits.shape[-1] == 1
    assert float(hinge_d_loss(jnp.ones((2,)), -jnp.ones((2,)))) == 0.0
    assert float(vanilla_d_loss(jnp.zeros((2,)), jnp.zeros((2,)))) > 0

    loss, log = generator_loss(
        x, x * 0.9, lambda a, b: lpips.apply(params, a, b),
        disc_fn=lambda r: disc.apply(dp, r),
        kl=jnp.ones((1,)),
    )
    assert np.isfinite(float(loss))
    assert {"rec_loss", "p_loss", "kl_loss", "g_loss"} <= set(log)


def test_class_embedder_and_rescaler():
    ce = ClassEmbedder(embed_dim=32, n_classes=10)
    p = ce.init(jax.random.PRNGKey(0), jnp.array([1, 2]))
    out = ce.apply(p, jnp.array([1, 2]))
    assert out.shape == (2, 1, 32)

    sr = SpatialRescaler(n_stages=2, out_channels=8, dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    p = sr.init(jax.random.PRNGKey(0), x)
    y = sr.apply(p, x)
    assert y.shape == (1, 8, 8, 8)


def test_bert_embedder():
    be = BERTEmbedder(n_embed=32, n_layer=2, vocab_size=100, num_heads=4)
    ids = jnp.zeros((2, 77), jnp.int32)
    p = be.init(jax.random.PRNGKey(0), ids)
    out = be.apply(p, ids)
    assert out.shape == (2, 77, 32)


def test_clip_image_embedder():
    emb = FrozenClipImageEmbedder(image_size=32)
    # small vision tower for the test
    from fgdm_tpu.utils.clip_score import CLIPVisionEncoder

    class Tiny(FrozenClipImageEmbedder):
        def setup(self):
            self.visual = CLIPVisionEncoder(image_size=32, patch_size=8,
                                            hidden=32, layers=1, heads=4,
                                            proj_dim=16)

    m = Tiny(image_size=32)
    x = jnp.zeros((2, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out.shape == (2, 16)
