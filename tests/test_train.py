"""Training-step tests: pjit DP mesh, adapter-only freeze, EMA, distill."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
from fgdm_tpu.models.autoencoder import AutoencoderKL
from fgdm_tpu.models.clip import CLIPTextEncoder
from fgdm_tpu.models.unet import UNetModel
from fgdm_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from fgdm_tpu.train.lr_schedules import lambda_linear, scaled_lr
from fgdm_tpu.train.state import (
    EmaState,
    TrainState,
    adapter_filter,
    make_adamw,
    merge_params,
    partition_params,
)
from fgdm_tpu.train.train_step import make_eval_step, make_train_step

UNET_TINY = dict(model_channels=32, num_heads=4, context_dim=64,
                 channel_mult=(1, 2), attention_resolutions=(1, 2),
                 num_res_blocks=1, dtype=jnp.float32)
VAE_TINY = dict(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                resolution=64, z_channels=4, embed_dim=4, dtype=jnp.float32)
CLIP_TINY = dict(vocab_size=128, embed_dim=64, num_layers=2, num_heads=4)


@pytest.fixture(scope="module")
def tiny_ld():
    rng = jax.random.PRNGKey(0)
    unet = UNetModel(**UNET_TINY)
    vae = AutoencoderKL(**VAE_TINY)
    clip = CLIPTextEncoder(**CLIP_TINY)
    return LatentDiffusion.create(unet, vae, clip, rng, latent_size=8)


def _batch(b=8):
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32) * 0.1,
        "input_ids": jnp.asarray(rng.integers(0, 128, (b, 77)), jnp.int32),
    }


def test_partition_adapter_only(tiny_ld):
    train, frozen = partition_params(tiny_ld.unet_params, adapter_filter())
    assert train and frozen
    assert all("adapter" in k for k in train)
    merged = merge_params(train, frozen)
    chex_equal = jax.tree.all(
        jax.tree.map(lambda a, b: bool(jnp.all(a == b)), merged,
                     tiny_ld.unet_params)
    )
    assert chex_equal


def test_train_step_updates_only_adapter(tiny_ld):
    tx = make_adamw(1e-3)
    state = TrainState.create(tiny_ld.unet_params, tx,
                              trainable_filter=adapter_filter(), use_ema=True)
    step = make_train_step(tiny_ld)
    # snapshot before the step — the train step donates (consumes) the state
    params_before = jax.tree.map(np.asarray, state.params)
    frozen_before = jax.tree.map(np.asarray, state.frozen)
    state2, metrics = step(state, _batch(4), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # adapter params moved
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
        params_before, state2.params,
    )
    assert max(jax.tree.leaves(moved)) > 0
    # frozen backbone identical
    same = jax.tree.map(
        lambda a, b: bool(np.all(a == np.asarray(b))),
        frozen_before, state2.frozen,
    )
    assert all(jax.tree.leaves(same))
    # EMA advanced
    assert int(state2.ema.num_updates) == 1


def test_loss_decreases(tiny_ld):
    # Train all params: with a fresh zero-init head conv, adapter-only
    # grads are exactly zero (real runs start from pretrained SD weights).
    tx = make_adamw(1e-2)
    state = TrainState.create(tiny_ld.unet_params, tx)
    step = make_train_step(tiny_ld)
    batch = _batch(4)
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_distill_step(tiny_ld):
    tx = make_adamw(1e-3)
    state = TrainState.create(tiny_ld.unet_params, tx,
                              trainable_filter=adapter_filter())
    step = make_train_step(tiny_ld, distill=True)
    state2, metrics = step(state, _batch(4), jax.random.PRNGKey(1))
    assert "loss_distill" in metrics
    assert np.isfinite(float(metrics["loss_distill"]))


def test_mesh_dp_train_step(tiny_ld):
    """8-device DP: batch sharded over 'data', state replicated, one step."""
    mesh = create_mesh(n_data=8)
    tx = make_adamw(1e-3)
    state = TrainState.create(tiny_ld.unet_params, tx,
                              trainable_filter=adapter_filter())
    step = make_train_step(tiny_ld, mesh=mesh)
    state = replicate(mesh, state)
    ld_batch = shard_batch(mesh, _batch(8))
    state2, metrics = step(state, ld_batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_ema_metrics(tiny_ld):
    tx = make_adamw(1e-3)
    state = TrainState.create(tiny_ld.unet_params, tx,
                              trainable_filter=adapter_filter(), use_ema=True)
    ev = make_eval_step(tiny_ld)
    metrics = ev(state, _batch(2), jax.random.PRNGKey(0))
    assert "val/loss_simple" in metrics and "val/loss_simple_ema" in metrics


def test_ema_warmup_decay():
    params = {"w": jnp.zeros((4,))}
    ema = EmaState.create(params, decay=0.9999)
    ema = ema.update({"w": jnp.ones((4,))})
    # first update: decay = min(0.9999, 2/11) → shadow = (1-2/11)*1
    np.testing.assert_allclose(np.asarray(ema.shadow["w"]),
                               1 - 2 / 11, rtol=1e-5)


def test_lr_scaling_rule():
    assert scaled_lr(1e-5, batch_size=8, n_devices=4,
                     accumulate_grad_batches=2) == pytest.approx(6.4e-4)
    assert scaled_lr(1e-5, batch_size=8, scale_lr=False) == 1e-5


def test_lambda_linear_schedule():
    f = lambda_linear(warm_up_steps=100, f_start=0.0, f_max=1.0, f_min=1.0)
    assert float(f(0)) == pytest.approx(0.0)
    assert float(f(50)) == pytest.approx(0.5)
    assert float(f(100)) == pytest.approx(1.0)
    assert float(f(100000)) == pytest.approx(1.0, abs=1e-6)


def test_distill_capture_split_equivalence(tiny_ld):
    """The split capture (capture fwd on tb rows + plain fwd on the rest)
    must give the same loss as one full-batch capture truncated after —
    the trailing rows may not influence loss_distill, and loss_simple must
    cover the whole batch."""
    from fgdm_tpu.diffusion.losses import diffusion_loss

    # randomize params: the fixture's zero-init head conv makes the model
    # output identically 0, which would hide batch-dependence
    import zlib

    leaves = jax.tree_util.tree_leaves_with_path(tiny_ld.unet_params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    # stable per-leaf key: builtin hash() is process-salted, and an unlucky
    # salt once drew a perturbation whose loss_simple delta fell under the
    # 1e-6 assertion threshold
    noisy = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.02 * jax.random.normal(
            keys[zlib.crc32(str(p).encode()) % len(keys)], x.shape, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tiny_ld.unet_params)
    ld = tiny_ld.replace(unet_params=noisy)

    rng = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 8, 8, 4), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(7), (4, 77, 64), jnp.float32)
    cond = {"c_crossattn": ctx}
    loss_a, md_a = diffusion_loss(ld, rng, x, cond, distill=True,
                                  trunc_bs=2)
    # perturb only the trailing rows: the distill term must be unchanged
    x2 = x.at[2:].add(0.37)
    loss_b, md_b = diffusion_loss(ld, rng, x2, cond, distill=True,
                                  trunc_bs=2)
    np.testing.assert_allclose(float(md_a["loss_distill"]),
                               float(md_b["loss_distill"]), rtol=1e-6)
    assert abs(float(md_a["loss_simple"]) - float(md_b["loss_simple"])) > 1e-6
    # trunc_bs = b degenerates to one capture forward over the full batch
    loss_c, md_c = diffusion_loss(ld, rng, x, cond, distill=True,
                                  trunc_bs=4)
    assert np.isfinite(float(md_c["loss_distill"]))


def test_teacher_maps_reduced_capture_equivalence(tiny_ld):
    """teacher_attention_maps (reduced capture: filtered + pooled in the
    score einsum) must equal the explicit full-capture-then-pool formula it
    replaced (ddpm.py:1799-1818 semantics)."""
    from fgdm_tpu.diffusion.losses import (
        _pool_cross_2x,
        nearest_upsample_2x_latent,
        teacher_attention_maps,
    )
    from fgdm_tpu.utils.attention_maps import (
        _resize_query_grid,
        avg_pool_map_2x,
    )

    ld = tiny_ld
    rng = np.random.default_rng(3)
    b = 2
    x_start = jnp.asarray(rng.standard_normal((b, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((b, 8, 8, 4)), jnp.float32)
    t = jnp.asarray([17, 401], jnp.int32)
    ids = jnp.asarray(rng.integers(0, 128, (b, 77)), jnp.int32)
    cond = {"c_crossattn": ld.get_learned_conditioning(ids)}

    t_self, t_cross = teacher_attention_maps(ld, x_start, noise, t, cond)

    # oracle: full capture, filter at 2·resn, pool after materializing
    resn = 8
    r2 = 2 * resn
    x2 = ld.schedule.q_sample(
        nearest_upsample_2x_latent(x_start), t,
        nearest_upsample_2x_latent(noise))
    _, sa, ca = ld.apply_model(x2, t, cond, adapter_on=False, capture=True)
    self_maps = [avg_pool_map_2x(m, times=2) for m in sa.values()
                 if int(round(m.shape[1] ** 0.5)) == r2]
    ref_self = sum(self_maps) / len(self_maps)
    cross_maps = []
    for m in ca.values():
        r = int(round(m.shape[1] ** 0.5))
        m = _resize_query_grid(m, r, r2).reshape(b, r2, r2, -1)
        cross_maps.append(_pool_cross_2x(m))
    ref_cross = sum(cross_maps) / len(cross_maps)

    np.testing.assert_allclose(np.asarray(t_self), np.asarray(ref_self),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(t_cross), np.asarray(ref_cross),
                               atol=2e-4)


def test_randomize_zero_heads(tiny_ld):
    """Scratch-smoke helper: zero-init kernels (≥2-D) get small deterministic
    noise, everything else is untouched, and the result is reproducible
    across calls (crc32-path keys, not salted str hash)."""
    from fgdm_tpu.train.state import randomize_zero_heads

    a = randomize_zero_heads(tiny_ld.unet_params)
    b = randomize_zero_heads(tiny_ld.unet_params)
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    l0 = jax.tree.leaves(tiny_ld.unet_params)
    changed = 0
    for x, y, orig in zip(la, lb, l0):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        if orig.ndim >= 2 and np.all(np.asarray(orig) == 0):
            changed += 1
            assert np.asarray(x).std() > 0, "zero head left at zero"
            assert float(jnp.abs(x).max()) < 0.2
        else:
            np.testing.assert_array_equal(np.asarray(x), np.asarray(orig))
    assert changed >= 1  # the UNet output head at minimum
