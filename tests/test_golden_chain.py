"""Golden-chain numerical regression gate.

The per-module torch oracles prove each block against the reference, but a
sampler/kernel refactor that shifts full-chain numerics (a schedule
constant, a CFG combination rule, an RNG split order) can slip between
them.  This test pins strided slices of the tiny-model ``fgdm_chain``
output for fixed seeds against a committed golden file, closing the loop
the per-module oracles don't see (reference output contract:
`scripts/txt2img_fgdm_inference.py:233-292`).

Regenerate deliberately after an *intended* numerics change with:

    FGDM_WRITE_GOLDEN=1 python -m pytest tests/test_golden_chain.py -q

and commit the updated ``tests/golden/chain_tiny_v1.npz`` alongside the
change that moved it.
"""

import os
import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.control import ControlLDM
from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.controlnet import ControlNet
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.sampling import chain

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "chain_tiny_v1.npz")

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)
VAE_TINY = dict(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                resolution=64, z_channels=4, embed_dim=4, dtype=jnp.float32)
CLIP_TINY = dict(vocab_size=128, embed_dim=64, num_layers=2, num_heads=4)


def _perturb(tree, key, scale=0.02):
    """Deterministic per-leaf perturbation so zero-init heads (UNet out conv,
    ControlNet taps) do real work — keys derive from the leaf path, making
    the golden invariant to tree-iteration order."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]

    def leaf_key(path):
        name = "/".join(str(p) for p in path)
        return jax.random.fold_in(key, zlib.crc32(name.encode()))

    perturbed = {
        jax.tree_util.keystr(path): leaf
        + scale * jax.random.normal(leaf_key(path), leaf.shape, leaf.dtype)
        for path, leaf in flat
    }
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(tree)[0]]
    it = iter([perturbed[p] for p in paths])
    return jax.tree.map(lambda _: next(it), tree)


@pytest.fixture(scope="module")
def chain_out():
    unet = UNetModel(**UNET_TINY)
    cn_unet = UNetModel(**UNET_TINY, use_adapter=False)
    vae = AutoencoderKL(**VAE_TINY)
    clip = CLIPTextEncoder(**CLIP_TINY)
    ld = LatentDiffusion.create(unet, vae, clip, jax.random.PRNGKey(0),
                                latent_size=8)
    cldm = ControlLDM.create_control(
        cn_unet, vae, clip,
        ControlNet(model_channels=32, num_heads=4, context_dim=64,
                   channel_mult=(1, 2), attention_resolutions=(1, 2),
                   num_res_blocks=1, dtype=jnp.float32),
        jax.random.PRNGKey(1), latent_size=8, control_scales=(1.0,) * 5)
    ld = ld.replace(unet_params=_perturb(ld.unet_params,
                                         jax.random.PRNGKey(10)))
    cldm = cldm.replace(
        unet_params=_perturb(cldm.unet_params, jax.random.PRNGKey(11)),
        control_params=_perturb(cldm.control_params, jax.random.PRNGKey(12)))

    ctx = jax.random.normal(jax.random.PRNGKey(13), (1, 77, 64))
    nctx = jax.random.normal(jax.random.PRNGKey(14), (1, 77, 64)) * 0.1

    @jax.jit
    def run(rng):
        return chain.fgdm_chain(
            ld, cldm, rng, ctx, nctx, ctx, nctx,
            cond_hw=(64, 64), image_hw=(64, 64),
            f1_steps=5, f2_steps=4,
        )

    return run(jax.random.PRNGKey(3))


def _slices(out):
    """Small, shape-stable probes: strided pixels + global moments of every
    chain output (condition, hint, image)."""
    probes = {}
    for name in ("condition", "hint", "image"):
        a = np.asarray(out[name], np.float64)
        probes[f"{name}_px"] = a[0, ::9, ::9, :].astype(np.float32)
        probes[f"{name}_mean"] = np.float32(a.mean())
        probes[f"{name}_std"] = np.float32(a.std())
    return probes


def test_chain_matches_golden(chain_out):
    probes = _slices(chain_out)
    if os.environ.get("FGDM_WRITE_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, **probes)
        pytest.skip(f"golden written to {GOLDEN_PATH}")
    assert os.path.exists(GOLDEN_PATH), (
        "golden file missing — run with FGDM_WRITE_GOLDEN=1 and commit it")
    golden = np.load(GOLDEN_PATH)
    assert set(golden.files) == set(probes)
    for k in sorted(probes):
        np.testing.assert_allclose(
            probes[k], golden[k], rtol=0, atol=2e-4,
            err_msg=f"chain numerics drifted at probe {k!r} — if this "
                    "change is intended, regenerate with FGDM_WRITE_GOLDEN=1")


def test_chain_output_is_alive(chain_out):
    """Guards the golden itself: all-finite, nonzero variance, sane ranges."""
    for name in ("condition", "hint", "image"):
        a = np.asarray(chain_out[name])
        assert np.all(np.isfinite(a)), name
        assert a.std() > 1e-3, name
    c = np.asarray(chain_out["condition"])
    assert c.min() >= 0.0 and c.max() <= 1.0
