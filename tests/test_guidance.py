"""Attention-alignment guidance tests, incl. torch-oracle kernel parity
against /root/reference/ldm/models/diffusion/loss.py."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.sampling.ddim import ddim_sample
from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from fgdm_tpu.sampling.guidance import (
    _active,
    _chunk_align_mse,
    _schedule,
    alignment_loss,
    cross_alignment_loss,
    guided_update,
    self_alignment_loss,
)


def test_schedule_buckets():
    scale, iters = _schedule(jnp.asarray(0))
    assert float(scale) == 4.0 and int(iters) == 2
    scale, iters = _schedule(jnp.asarray(3))
    assert float(scale) == 4.0 and int(iters) == 6
    scale, iters = _schedule(jnp.asarray(7))
    assert float(scale) == 3.0 and int(iters) == 3
    scale, iters = _schedule(jnp.asarray(15))
    assert float(scale) == 3.0 and int(iters) == 2
    scale, iters = _schedule(jnp.asarray(40))
    assert float(scale) == 1.0 and int(iters) == 2


def test_active_steps():
    active = [int(i) for i in range(40) if bool(_active(jnp.asarray(i)))]
    assert active[:10] == list(range(10))
    assert 15 in active and 20 in active and 35 in active
    assert 12 not in active and 36 not in active and 37 not in active


def test_chunk_align_mse_zero_for_identical():
    m = jnp.ones((4, 8, 8))
    assert float(_chunk_align_mse(m, 2)) == 0.0
    m2 = m.at[2:].set(2.0)  # second chunk differs
    assert float(_chunk_align_mse(m2, 2)) > 0


def test_alignment_loss_zero_when_aligned():
    sa = {"a": jnp.ones((4, 256, 256))}
    ca = {"a": jnp.ones((4, 256, 77))}
    loss = alignment_loss(sa, ca, num=2, loss_scale=jnp.asarray(1.0))
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)


def test_alignment_loss_flattens_per_head_maps():
    """4D [B,h,N,M] per-head captures flatten to torch's (b·h, N, M)."""
    rng = np.random.default_rng(0)
    m4 = jnp.asarray(rng.standard_normal((2, 2, 256, 256)), jnp.float32)
    m3 = m4.reshape(4, 256, 256)
    a = self_alignment_loss({"x": m4}, num=2)
    b = self_alignment_loss({"x": m3}, num=2)
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


@pytest.fixture(scope="module")
def ref_loss():
    import os

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree not mounted")
    torch = pytest.importorskip("torch")
    # loss.py imports torchvision.utils.save_image (unused in the kernels).
    # Keep the stub as rich as test_torch_oracle's: setdefault means the
    # first file to run wins for the whole session, and the oracle tests
    # also need make_grid (+ a real __spec__ for find_spec callers).
    import importlib.machinery

    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tv.__path__ = []
    tvu = types.ModuleType("torchvision.utils")
    tvu.__spec__ = importlib.machinery.ModuleSpec("torchvision.utils", None)
    tvu.save_image = lambda *a, **k: None
    tvu.make_grid = lambda *a, **k: None
    tvt = types.ModuleType("torchvision.transforms")
    tvt.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", None)
    tvt.ToTensor = tvt.Compose = tvt.Resize = tvt.Normalize = object
    tv.utils = tvu
    tv.transforms = tvt
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    sys.modules.setdefault("torchvision.transforms", tvt)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from ldm.models.diffusion import loss as ref

    return ref, torch


def test_self_align_parity_vs_reference(ref_loss):
    """caculate_align_loss_self_att oracle: same maps, same loss.

    Reference nesting: self_first = [att, ...] with att[0] = list of 3D
    (b·h, N, N) maps (loss.py:140-152)."""
    ref, torch = ref_loss
    rng = np.random.default_rng(1)
    m1 = rng.standard_normal((4, 256, 256)).astype(np.float32)
    m2 = rng.standard_normal((4, 256, 256)).astype(np.float32)
    want = ref.caculate_align_loss_self_att(
        [[[torch.from_numpy(m1)]], [[torch.from_numpy(m2)]]], [], [], num=2)
    got = self_alignment_loss({"a": jnp.asarray(m1), "b": jnp.asarray(m2)},
                              num=2)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_cross_align_parity_vs_reference(ref_loss):
    """caculate_align_loss_att_fixed oracle: aggregate over layers+batch,
    drop BOT/EOT, ×100, softmax, row-chunk MSE ÷ num (loss.py:272-292)."""
    ref, torch = ref_loss
    rng = np.random.default_rng(2)
    m_mid = rng.standard_normal((4, 256, 77)).astype(np.float32)
    m_up = rng.standard_normal((4, 256, 77)).astype(np.float32)
    m_down = rng.standard_normal((4, 256, 77)).astype(np.float32)
    want = ref.caculate_align_loss_att_fixed(
        [[torch.from_numpy(m_mid)]],          # mid: att[0] is the map
        [[[torch.from_numpy(m_up)]]],         # up: att[0][0] is the map
        [[[torch.from_numpy(m_down)]]],       # down: att[0][0] is the map
        num=2)
    got = cross_alignment_loss(
        {"m": jnp.asarray(m_mid), "u": jnp.asarray(m_up),
         "d": jnp.asarray(m_down)}, num=2)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_ld():
    kw = dict(model_channels=32, num_heads=4, context_dim=64,
              channel_mult=(1, 2), attention_resolutions=(1, 2),
              num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                        resolution=32, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=64, embed_dim=64, num_layers=1,
                           num_heads=4)
    return LatentDiffusion.create(UNetModel(**kw), vae, clip,
                                  jax.random.PRNGKey(0), latent_size=16,
                                  init_first_stage=False)


def test_guided_update_moves_x(tiny_ld):
    ld = tiny_ld
    apply_capture = ld.capture_fn()

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.zeros((2,), jnp.int32)
    cond = {"c_crossattn": jax.random.normal(jax.random.PRNGKey(2),
                                             (2, 77, 64))}

    @jax.jit
    def run(x, step):
        return guided_update(apply_capture, x, t, cond, step, num=2)

    out_active = run(x, jnp.asarray(3))
    assert out_active.shape == x.shape
    assert not np.allclose(np.asarray(out_active), np.asarray(x))
    # inactive step (e.g. 12) leaves x untouched
    out_idle = run(x, jnp.asarray(12))
    np.testing.assert_array_equal(np.asarray(out_idle), np.asarray(x))


def test_ddim_guidance_end_to_end(tiny_ld):
    """Guidance on vs off under one compiled program → different, finite
    samples (reference p_sample_ddim(inference_loss=True) semantics)."""
    ld = tiny_ld
    sched = DDIMSchedule.create(ld.schedule, 5)
    cond = {"c_crossattn": jax.random.normal(jax.random.PRNGKey(2),
                                             (2, 77, 64))}
    uncond = {"c_crossattn": jnp.zeros((2, 77, 64))}
    # randomize the zero-init output head so eps ≠ 0
    params = jax.tree.map(
        lambda p: p + 0.01 * np.random.default_rng(0).standard_normal(
            p.shape).astype(np.float32) if p.ndim > 0 else p,
        ld.unet_params)
    ld = ld.replace(unet_params=params)

    import functools

    @functools.partial(jax.jit, static_argnums=0)
    def run(guided: bool):
        return ddim_sample(
            ld.denoise_fn(), jax.random.PRNGKey(5), (2, 16, 16, 4), sched,
            cond, uncond, cfg_scale=3.0,
            guidance_fn=ld.capture_fn() if guided else None)[0]

    plain = run(False)
    guided = run(True)
    assert np.all(np.isfinite(np.asarray(guided)))
    assert not np.allclose(np.asarray(plain), np.asarray(guided))
