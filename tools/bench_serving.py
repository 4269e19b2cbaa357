"""Serving throughput under concurrent load: micro-batching on vs off.

Builds the production ChainEngine (staged compile), then drives it with
N concurrent single-prompt clients through server.RequestBatcher and
reports requests/s and chip-batch occupancy for window=0 (serialized
solo requests, each padded to max_batch) vs window>0 (coalesced full
batches).  The occupancy delta is the whole story: a solo request wastes
(max_batch-1)/max_batch of every chain invocation.

Usage (real chip):
    python tools/bench_serving.py [--clients 8] [--requests 16]
                                  [--window_ms 150] [--tiny]

--tiny swaps in the test-size models (CPU smoke run, no chip needed).
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(tiny: bool):
    import jax
    import jax.numpy as jnp

    from fgdm_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # staged serving programs compile in minutes

    from fgdm_tpu.diffusion.control import ControlLDM
    from fgdm_tpu.diffusion.latent_diffusion import LatentDiffusion
    from fgdm_tpu.models.autoencoder import AutoencoderKL
    from fgdm_tpu.models.clip import CLIPTextEncoder
    from fgdm_tpu.models.controlnet import ControlNet
    from fgdm_tpu.models.unet import UNetModel
    from fgdm_tpu.serving import ChainEngine

    if tiny:
        kw = dict(model_channels=32, num_heads=4, context_dim=64,
                  channel_mult=(1, 2), attention_resolutions=(1, 2),
                  num_res_blocks=1, dtype=jnp.float32)
        vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                            resolution=64, dtype=jnp.float32)
        clip = CLIPTextEncoder(vocab_size=49408, embed_dim=64,
                               num_layers=1, num_heads=4)
        ld = LatentDiffusion.create(UNetModel(**kw), vae, clip,
                                    jax.random.PRNGKey(0), latent_size=8)
        cldm = ControlLDM.create_control(
            UNetModel(**kw, use_adapter=False), vae, clip, ControlNet(**kw),
            jax.random.PRNGKey(1), latent_size=8,
            control_scales=(1.0,) * 5)
        return ChainEngine(ld, cldm, max_batch=4, cond_hw=(64, 64),
                           image_hw=(64, 64), f1_steps=2, f2_steps=2,
                           staged=True)
    from fgdm_tpu.checkpoint.loader import load_controlnet, load_fgdm

    ld = load_fgdm(os.environ.get("FGDM_CKPT"))
    cldm = load_controlnet(os.environ.get("FGDM_CN_CKPT"))
    return ChainEngine(ld, cldm, max_batch=4, staged=True)


def drive(engine, n_clients: int, n_requests: int, window_ms: float):
    from fgdm_tpu.server import RequestBatcher

    calls = {"n": 0}
    real = engine.generate

    def counted(prompts, seed=0, seeds=None):
        calls["n"] += 1
        return real(prompts, seed=seed, seeds=seeds)

    engine.generate, saved = counted, engine.generate
    try:
        batcher = RequestBatcher(engine, window_ms=window_ms)
        sem = threading.Semaphore(n_clients)
        done = []

        errors = []

        def one(i):
            with sem:
                try:
                    batcher.generate([f"prompt {i}"], seed=0)
                except Exception as e:
                    errors.append(e)
                    return
                done.append(i)

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(n_requests)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
    finally:
        engine.generate = saved
    if errors:
        raise RuntimeError(
            f"{len(errors)}/{n_requests} requests failed; first: "
            f"{errors[0]!r}") from errors[0]
    occ = len(done) / max(calls["n"], 1)
    return {"window_ms": window_ms, "requests": len(done),
            "wall_s": round(dt, 3), "req_per_s": round(len(done) / dt, 3),
            "engine_calls": calls["n"],
            "occupancy": round(occ, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--window_ms", type=float, default=150.0)
    ap.add_argument("--tiny", action="store_true")
    opt = ap.parse_args()

    if opt.tiny:
        # force CPU before first backend touch (the host shell pins the
        # TPU tunnel platform and sitecustomize imports jax early)
        import jax

        jax.config.update("jax_platforms", "cpu")

    engine = build_engine(opt.tiny)
    print(f"engine ready (compile {engine.compile_seconds:.1f}s)")
    for window in (0.0, opt.window_ms):
        r = drive(engine, opt.clients, opt.requests, window)
        print(r)


if __name__ == "__main__":
    main()
