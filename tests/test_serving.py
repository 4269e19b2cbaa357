"""ChainEngine serving tests (tiny models)."""

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
from fgdm_tpu.serving import ChainEngine

KW = dict(model_channels=32, num_heads=4, context_dim=64,
          channel_mult=(1, 2), attention_resolutions=(1, 2),
          num_res_blocks=1, dtype=jnp.float32)


@pytest.fixture(scope="module")
def engine():
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=49408, embed_dim=64, num_layers=2,
                           num_heads=4)
    ld = LatentDiffusion.create(UNetModel(**KW), vae, clip,
                                jax.random.PRNGKey(0), latent_size=8)
    cldm = ControlLDM.create_control(
        UNetModel(**KW, use_adapter=False), vae, clip, ControlNet(**KW),
        jax.random.PRNGKey(1), latent_size=8, control_scales=(1.0,) * 5)
    return ChainEngine(ld, cldm, max_batch=2, cond_hw=(64, 64),
                       image_hw=(64, 64), f1_steps=2, f2_steps=2)


def test_generate_single(engine):
    out = engine.generate(["a cat"], seed=1)
    assert out["images"].shape == (1, 64, 64, 3)
    assert out["images"].dtype == np.uint8
    assert out["conditions"].shape == (1, 64, 64, 3)


def test_generate_batch_and_padding(engine):
    out = engine.generate(["a cat", "a dog"], seed=2)
    assert out["images"].shape == (2, 64, 64, 3)
    # padded single-prompt call returns only 1 image, runs same executable
    out1 = engine.generate(["a cat"], seed=2)
    np.testing.assert_array_equal(out1["images"][0], out["images"][0])


def test_generate_rejects_overflow(engine):
    with pytest.raises(ValueError):
        engine.generate(["a"] * 3)
    with pytest.raises(ValueError):
        engine.generate([])


def test_seed_determinism(engine):
    a = engine.generate(["x"], seed=7)["images"]
    b = engine.generate(["x"], seed=7)["images"]
    c = engine.generate(["x"], seed=8)["images"]
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_slot_invariance(engine):
    """Per-slot RNG: (prompt, seed) yields the same image in ANY batch
    composition or slot position — the micro-batching contract."""
    solo = engine.generate(["a cat"], seed=7)
    slot0 = engine.generate(["a cat", "a dog"], seeds=[7, 3])
    slot1 = engine.generate(["a dog", "a cat"], seeds=[3, 7])
    np.testing.assert_array_equal(solo["images"][0], slot0["images"][0])
    np.testing.assert_array_equal(solo["images"][0], slot1["images"][1])
    np.testing.assert_array_equal(solo["conditions"][0],
                                  slot0["conditions"][0])
    # and the dog half is its own independent stream
    dog = engine.generate(["a dog"], seed=3)
    np.testing.assert_array_equal(dog["images"][0], slot1["images"][0])


def test_per_request_seeds_validation(engine):
    with pytest.raises(ValueError):
        engine.generate(["a", "b"], seeds=[1])


def test_mesh_sharded_engine_matches_single_chip(engine):
    """DP serving over the 8-device CPU mesh: batch shards over 'data',
    params replicate, and the output matches the single-chip engine
    bit-for-bit (same program, same seeds, no collectives on the fwd)."""
    from fgdm_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(n_data=8, n_model=1)
    m_engine = ChainEngine(engine.ld, engine.cldm, max_batch=8,
                           cond_hw=(64, 64), image_hw=(64, 64),
                           f1_steps=2, f2_steps=2, mesh=mesh)
    out = m_engine.generate(["a cat"] * 8, seed=3)
    assert out["images"].shape == (8, 64, 64, 3)
    assert out["images"].std() > 0


def test_mesh_engine_rejects_indivisible_batch(engine):
    from fgdm_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(n_data=8, n_model=1)
    with pytest.raises(ValueError):
        ChainEngine(engine.ld, engine.cldm, max_batch=6,
                    cond_hw=(64, 64), image_hw=(64, 64),
                    f1_steps=2, f2_steps=2, mesh=mesh, warmup=False)


def test_staged_engine_matches_fused(engine):
    """staged=True compiles four stage programs; outputs must match the
    one-program chain bit-for-bit (same PRNG splits, same stage math)."""
    staged = ChainEngine(engine.ld, engine.cldm, tokenizer=engine.tok,
                         max_batch=2, cond_hw=(64, 64), image_hw=(64, 64),
                         f1_steps=2, f2_steps=2, staged=True, warmup=False)
    a = engine.generate(["a cat", "a dog"], seed=3)
    b = staged.generate(["a cat", "a dog"], seed=3)
    np.testing.assert_array_equal(a["images"], b["images"])
    np.testing.assert_array_equal(a["conditions"], b["conditions"])


def test_engine_fast_preset_sampler(engine):
    """f1_sampler='dpm' (the fast serving preset) produces valid output,
    differs from the ddim engine, and stays staged/fused bit-identical."""
    kw = dict(tokenizer=engine.tok, max_batch=2, cond_hw=(64, 64),
              image_hw=(64, 64), f1_steps=2, f2_steps=2,
              f1_sampler="dpm", warmup=False)
    fused = ChainEngine(engine.ld, engine.cldm, **kw)
    staged = ChainEngine(engine.ld, engine.cldm, staged=True, **kw)
    a = fused.generate(["a cat"], seed=3)
    assert a["images"].shape == (1, 64, 64, 3)
    b = staged.generate(["a cat"], seed=3)
    np.testing.assert_array_equal(a["images"], b["images"])
    # the sampler change must actually change the trajectory
    c = engine.generate(["a cat"], seed=3)
    assert not np.array_equal(a["conditions"], c["conditions"])


def test_bench_serving_drive_counts_and_seeds():
    """tools/bench_serving.drive must keep working against the REAL
    RequestBatcher call convention (it broke once: the batcher passes
    seeds=, the counting wrapper only accepted seed=) — use a fake engine
    so this runs in milliseconds."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    import bench_serving

    class FakeEngine:
        max_batch = 4
        compile_seconds = 0.0

        def generate(self, prompts, seed=0, seeds=None):
            assert seeds is None or len(seeds) == len(prompts)
            n = len(prompts)
            z = np.zeros((n, 4, 4, 3), np.uint8)
            return {"images": z, "conditions": z}

    eng = FakeEngine()
    r = bench_serving.drive(eng, n_clients=4, n_requests=8, window_ms=50.0)
    assert r["requests"] == 8
    assert r["engine_calls"] >= 2  # 8 single-prompt reqs, batch 4
    assert r["occupancy"] > 1.0  # coalescing actually happened
    # the wrapper is removed afterwards
    assert eng.generate.__func__ is FakeEngine.generate

    # a failing engine must surface as an error, not requests=0 + rc 0
    class BrokenEngine(FakeEngine):
        def generate(self, prompts, seed=0, seeds=None):
            raise ValueError("boom")

    with pytest.raises(RuntimeError, match="requests failed"):
        bench_serving.drive(BrokenEngine(), 2, 2, 0.0)
