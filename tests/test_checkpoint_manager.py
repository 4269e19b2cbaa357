"""Orbax checkpoint manager + v-param loss + ucg schedule tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.checkpoint.orbax_io import CheckpointManager, load_pytree, save_pytree
from fgdm_tpu.core.schedules import DDIMSchedule, DiffusionSchedule
from fgdm_tpu.sampling.ddim import ddim_sample

SD_ARGS = dict(linear_start=0.00085, linear_end=0.0120)


def test_save_restore_roundtrip(tmp_path):
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                       "b": jnp.zeros((3,))},
            "step": jnp.asarray(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpts"), keep=2)
    assert mgr.save(0, tree, force=True)
    mgr.wait()
    restored = mgr.restore(0, target=tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))
    assert mgr.latest_step() == 0
    mgr.close()


def test_restore_host_is_numpy(tmp_path):
    """restore_host returns host numpy leaves (no device_put) with exact
    values — the full-size roundtrip check relies on this to avoid a second
    HBM copy of the live state (hw_validate_recipes OOM)."""
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": {"c": jnp.ones((4,), jnp.int32)}}
    mgr = CheckpointManager(str(tmp_path / "h"), keep=1)
    assert mgr.save(3, tree, force=True)
    mgr.wait()
    r = mgr.restore_host(template=tree)
    for leaf in jax.tree.leaves(r):
        assert isinstance(leaf, np.ndarray), type(leaf)
    np.testing.assert_array_equal(r["a"], np.asarray(tree["a"]))
    np.testing.assert_array_equal(r["b"]["c"], np.asarray(tree["b"]["c"]))
    mgr.close()

    # a fresh manager on the same dir has no item metadata — restore_host
    # must fail loud rather than silently degrade to the device-put path
    mgr2 = CheckpointManager(str(tmp_path / "h"), keep=1)
    if mgr2._mgr.item_metadata(3) is None:
        with pytest.raises(ValueError):
            mgr2.restore_host()
    r2 = mgr2.restore_host(template=tree)
    np.testing.assert_array_equal(r2["a"], np.asarray(tree["a"]))
    mgr2.close()


def test_retention_policy(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "c"), keep=2,
                            save_interval_steps=1)
    tree = {"x": jnp.zeros((2,))}
    for s in range(4):
        mgr.save(s, tree, force=True)
    mgr.wait()
    assert mgr.latest_step() == 3
    mgr.close()


def test_standalone_pytree_io(tmp_path):
    tree = {"a": jnp.ones((4, 4))}
    save_pytree(str(tmp_path / "single"), tree)
    back = load_pytree(str(tmp_path / "single"), target=tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.ones((4, 4)))


def test_full_train_state_roundtrip(tmp_path):
    """Faithful resume: params + opt_state + EMA + step all survive the
    save/restore cycle (ADVICE r1: previously only params were saved)."""
    from fgdm_tpu.train.state import (TrainState, adapter_filter, make_adamw,
                                      state_from_pytree, state_to_pytree)

    params = {"params": {
        "adapter": {"w": jnp.ones((4, 4))},
        "backbone": {"w": jnp.full((4,), 2.0)},
    }}
    tx = make_adamw(1e-2)
    state = TrainState.create(params, tx, trainable_filter=adapter_filter(),
                              use_ema=True)
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)
    state = state.apply_gradients(grads)

    mgr = CheckpointManager(str(tmp_path / "full"), keep=1)
    assert mgr.save(int(state.step), state_to_pytree(state), force=True)
    mgr.wait()

    fresh = TrainState.create(params, tx, trainable_filter=adapter_filter(),
                              use_ema=True)
    restored = mgr.restore(target=state_to_pytree(fresh))
    resumed = state_from_pytree(fresh, restored)
    assert int(resumed.step) == 2
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        (resumed.params, resumed.opt_state, resumed.ema.shadow,
         resumed.ema.num_updates),
        (state.params, state.opt_state, state.ema.shadow,
         state.ema.num_updates))
    # another step after resume works (optimizer state intact)
    resumed.apply_gradients(grads)
    mgr.close()


def test_v_param_loss():
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.diffusion.losses import diffusion_loss
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel

    kw = dict(model_channels=32, num_heads=4, context_dim=64,
              channel_mult=(1, 2), attention_resolutions=(1, 2),
              num_res_blocks=1, dtype=jnp.float32)
    ld = LatentDiffusion.create(
        UNetModel(**kw),
        AutoencoderKL(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32,
                      dtype=jnp.float32),
        CLIPTextEncoder(vocab_size=64, embed_dim=64, num_layers=1,
                        num_heads=4),
        jax.random.PRNGKey(0), latent_size=8, init_first_stage=False)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    cond = {"c_crossattn": jnp.zeros((2, 77, 64))}
    loss, d = diffusion_loss(ld, jax.random.PRNGKey(2), x, cond,
                             parameterization="v")
    assert np.isfinite(float(loss))


def test_ucg_schedule():
    s = DiffusionSchedule.create(1000, "linear", **SD_ARGS)
    d = DDIMSchedule.create(s, 4)
    calls = []

    def denoise(x, t, cond):
        calls.append(x.shape[0])
        return 0.1 * x

    cond = {"c": jnp.zeros((1, 4))}
    uncond = {"c": jnp.ones((1, 4))}
    sched_scales = jnp.asarray([9.0, 7.0, 5.0, 1.0])
    out, _ = ddim_sample(denoise, jax.random.PRNGKey(0), (1, 4, 4, 4), d,
                         cond, uncond, cfg_scale=7.5,
                         ucg_schedule=sched_scales)
    assert np.all(np.isfinite(np.asarray(out)))
