"""Mesh / tensor-parallel sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fgdm_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from fgdm_tpu.parallel.tp import count_sharded, shard_params_tp, tp_spec


def test_tp_spec_rules():
    assert tp_spec(("attn1", "to_q", "kernel"), (512, 512), 2) == \
        P(None, "model")
    assert tp_spec(("attn1", "to_out", "kernel"), (512, 512), 2) == \
        P("model", None)
    assert tp_spec(("ff", "net_0", "proj", "kernel"), (320, 2560), 2) == \
        P(None, "model")
    # norms / biases replicated
    assert tp_spec(("norm1", "scale"), (512,), 2) == P()
    # tiny tensors stay replicated
    assert tp_spec(("to_q", "kernel"), (64, 64), 2) == P()
    # conv output channels
    assert tp_spec(("in_conv", "kernel"), (3, 3, 320, 640), 2) == \
        P(None, None, None, "model")


def test_tp_dp_train_step_matches_replicated():
    """The TP×DP step must produce the same loss as pure-DP."""
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.train.state import TrainState, adapter_filter, make_adamw
    from fgdm_tpu.train.train_step import make_train_step

    rng = jax.random.PRNGKey(0)
    unet = UNetModel(model_channels=32, num_heads=4, context_dim=64,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=128, embed_dim=64, num_layers=2,
                           num_heads=4)
    ld = LatentDiffusion.create(unet, vae, clip, rng, latent_size=8)
    batch_host = {
        "image": np.random.default_rng(0).standard_normal(
            (8, 64, 64, 3)).astype(np.float32) * 0.1,
        "input_ids": np.zeros((8, 77), np.int32),
    }

    losses = {}
    for name, (nd, nm) in {"dp": (8, 1), "tp": (4, 2)}.items():
        mesh = create_mesh(n_data=nd, n_model=nm)
        tx = make_adamw(1e-4)
        state = TrainState.create(ld.unet_params, tx,
                                  trainable_filter=adapter_filter())
        state = replicate(mesh, state)
        if nm > 1:
            state = state.replace(
                frozen=shard_params_tp(mesh, state.frozen, min_shard_dim=32))
            ns, total = count_sharded(mesh, state.frozen, min_shard_dim=32)
            assert ns > 50, f"TP rules matched only {ns}/{total}"
        step = make_train_step(ld, mesh=mesh, infer_state_sharding=nm > 1)
        batch = shard_batch(mesh, batch_host)
        _, metrics = step(state, batch, jax.random.PRNGKey(1))
        losses[name] = float(metrics["loss"])

    np.testing.assert_allclose(losses["dp"], losses["tp"], rtol=1e-4)


def test_maybe_initialize_distributed(monkeypatch):
    """No-op without cluster env; forwards coordinator env when declared."""
    import fgdm_tpu.parallel.mesh as pm

    monkeypatch.delenv("FGDM_DISTRIBUTED", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert pm.maybe_initialize_distributed() is False

    calls = {}
    monkeypatch.setattr(pm.jax.distributed, "initialize",
                        lambda **kw: calls.update(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert pm.maybe_initialize_distributed() is True
    assert calls == {"coordinator_address": "10.0.0.1:1234",
                     "num_processes": 4, "process_id": 2}


def test_tp_byte_coverage_sd_unet():
    """≥99% of the SD-1.x UNet's parameter BYTES shard over 'model'
    (VERDICT r2 #9: the r2 rule table left net_2/emb_proj/time_embed
    replicated — 91.7% — and the dryrun's 101/286 param *count* under-
    reported actual coverage)."""
    import numpy as np

    from fgdm_tpu.checkpoint.loader import sd_unet
    from fgdm_tpu.parallel.tp import _split_path

    u = sd_unet(dtype=jnp.float32)
    params = jax.eval_shape(lambda: u.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768))))
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    for n_model in (2, 4):
        tot = sh = 0
        for p, v in flat.items():
            b = int(np.prod(v.shape))
            tot += b
            if tp_spec(_split_path(p), tuple(v.shape), n_model) != P():
                sh += b
        assert sh / tot > 0.99, f"model={n_model}: {sh/tot:.1%}"


def test_fsdp_spec_rules():
    from fgdm_tpu.parallel.fsdp import fsdp_spec

    # largest divisible dim wins
    assert fsdp_spec((320, 2560), 8, min_size=0) == P(None, "data")
    assert fsdp_spec((2560, 320), 8, min_size=0) == P("data", None)
    # conv HWIO: channels, not the 3x3 taps
    assert fsdp_spec((3, 3, 320, 640), 8, min_size=0) == \
        P(None, None, None, "data")
    # small leaves stay put
    assert fsdp_spec((320,), 8) == P()
    # scalars / indivisible shapes stay put
    assert fsdp_spec((), 8, min_size=0) == P()
    assert fsdp_spec((7, 13), 8, min_size=0) == P()
    # composes with TP: 'model' dim is taken, 'data' goes elsewhere
    assert fsdp_spec((320, 2560), 8, base=P(None, "model"), min_size=0) == \
        P("data", "model")
    # already data-sharded → unchanged
    assert fsdp_spec((320, 2560), 8, base=P("data", None), min_size=0) == \
        P("data", None)


def test_fsdp_train_step_matches_replicated():
    """FSDP-stored state (params+opt+EMA sharded over 'data') and an
    FSDP-stored frozen pipeline must step to the same loss as plain DP,
    with per-device shards actually 1/8th-sized."""
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.parallel.fsdp import count_fsdp, shard_state_fsdp
    from fgdm_tpu.train.state import TrainState, adapter_filter, make_adamw
    from fgdm_tpu.train.train_step import make_train_step

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    rng = jax.random.PRNGKey(0)
    unet = UNetModel(model_channels=32, num_heads=4, context_dim=64,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, dtype=jnp.float32)
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=128, embed_dim=64, num_layers=2,
                           num_heads=4)
    ld = LatentDiffusion.create(unet, vae, clip, rng, latent_size=8)
    batch_host = {
        "image": np.random.default_rng(0).standard_normal(
            (8, 64, 64, 3)).astype(np.float32) * 0.1,
        "input_ids": np.zeros((8, 77), np.int32),
    }
    mesh = create_mesh(n_data=8, n_model=1)
    results = {}
    for name in ("dp", "fsdp"):
        tx = make_adamw(1e-2)
        state = TrainState.create(ld.unet_params, tx,
                                  trainable_filter=adapter_filter(),
                                  use_ema=True)
        state = replicate(mesh, state)
        ld_in = ld
        if name == "fsdp":
            state = shard_state_fsdp(mesh, state, min_size=1024)
            ld_in = shard_state_fsdp(mesh, ld, min_size=1024)
            ns, total, frac = count_fsdp(mesh, state, min_size=1024)
            assert frac > 0.8, f"FSDP sharded only {frac:.1%} of bytes"
            # storage really is distributed: biggest frozen leaf holds
            # 1/8th of its elements per device
            big = max(jax.tree.leaves(state.frozen), key=lambda v: v.size)
            shard = big.addressable_shards[0].data
            assert shard.size * 8 == big.size, (shard.shape, big.shape)
        step = make_train_step(ld_in, mesh=mesh,
                               infer_state_sharding=name == "fsdp",
                               infer_ld_sharding=name == "fsdp")
        batch = shard_batch(mesh, batch_host)
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        results[name] = (float(metrics["loss"]),
                         float(metrics["grad_norm"]), new_state)

    np.testing.assert_allclose(results["dp"][0], results["fsdp"][0],
                               rtol=1e-4)
    np.testing.assert_allclose(results["dp"][1], results["fsdp"][1],
                               rtol=1e-3)
    # updated trainable params agree leaf-for-leaf (gather fsdp shards)
    pd = jax.tree.map(np.asarray, results["dp"][2].params)
    pf = jax.tree.map(np.asarray, results["fsdp"][2].params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
                 pd, pf)
    # a second fsdp step runs on the (donated, inferred-sharding) output
    state2, m2 = make_train_step(
        ld, mesh=mesh, infer_state_sharding=True)(
            results["fsdp"][2], shard_batch(mesh, batch_host),
            jax.random.PRNGKey(2))
    assert np.isfinite(float(m2["loss"]))
