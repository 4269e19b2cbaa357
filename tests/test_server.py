"""HTTP serving front-end tests (real socket, tiny engine)."""

import base64
import json
import threading
import urllib.request

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
from fgdm_tpu.server import serve
from fgdm_tpu.serving import ChainEngine

KW = dict(model_channels=32, num_heads=4, context_dim=64,
          channel_mult=(1, 2), attention_resolutions=(1, 2),
          num_res_blocks=1, dtype=jnp.float32)


@pytest.fixture(scope="module")
def engine():
    vae = AutoencoderKL(ch=32, ch_mult=(1, 2, 4, 4), num_res_blocks=1,
                        resolution=64, dtype=jnp.float32)
    clip = CLIPTextEncoder(vocab_size=49408, embed_dim=64, num_layers=1,
                           num_heads=4)
    ld = LatentDiffusion.create(UNetModel(**KW), vae, clip,
                                jax.random.PRNGKey(0), latent_size=8)
    cldm = ControlLDM.create_control(
        UNetModel(**KW, use_adapter=False), vae, clip, ControlNet(**KW),
        jax.random.PRNGKey(1), latent_size=8, control_scales=(1.0,) * 5)
    return ChainEngine(ld, cldm, max_batch=2, cond_hw=(64, 64),
                       image_hw=(64, 64), f1_steps=2, f2_steps=2)


@pytest.fixture(scope="module")
def server_port(engine):
    port = 8517
    t = threading.Thread(target=serve,
                         args=(engine, "127.0.0.1", port),
                         kwargs={"max_requests": 5}, daemon=True)
    t.start()
    yield port


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server_port):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server_port}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok" and body["max_batch"] == 2


def test_generate(server_port):
    status, body = _post(server_port, {"prompts": ["a cat"], "seed": 3})
    assert status == 200
    assert len(body["images"]) == 1 and len(body["conditions"]) == 1
    png = base64.b64decode(body["images"][0])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert body["latency_s"] > 0


def test_generate_rejects_bad_requests(server_port):
    status, body = _post(server_port, {"prompts": []})
    assert status == 400 and "prompts" in body["error"]
    status, body = _post(server_port, {"prompts": ["a", "b", "c"]})
    assert status == 400 and "at most 2" in body["error"]


def test_batching_coalesces_concurrent_requests(engine):
    """Two concurrent requests with DIFFERENT seeds merge into ONE
    compiled-batch call, and each caller's slice is bit-identical to its
    solo run (the engine's per-slot RNG contract)."""
    import numpy as np

    from fgdm_tpu.server import RequestBatcher

    calls = []
    real_generate = engine.generate

    class Counting:
        max_batch = engine.max_batch
        compile_seconds = engine.compile_seconds

        @staticmethod
        def generate(prompts, seed=0, seeds=None):
            calls.append((tuple(prompts), tuple(seeds or [])))
            return real_generate(prompts, seed=seed, seeds=seeds)

    batcher = RequestBatcher(Counting, window_ms=2000)
    results = {}
    req_seeds = {"a cat": 0, "a dog": 7}

    def hit(name):
        results[name] = batcher.generate([name], seed=req_seeds[name])

    threads = [threading.Thread(target=hit, args=(n,))
               for n in ("a cat", "a dog")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {"a cat", "a dog"}
    for r in results.values():
        assert r["images"].shape[0] == 1
    assert len(calls) == 1 and len(calls[0][0]) == 2  # mixed-seed coalesce
    assert batcher.batches_run == 1
    # bit-identity with solo runs, whichever slot each request landed on
    for name, s in req_seeds.items():
        solo = real_generate([name], seed=s)
        np.testing.assert_array_equal(results[name]["images"][0],
                                      solo["images"][0])


def test_batching_server_roundtrip(engine):
    """End-to-end over HTTP: threaded server with a batch window serves
    concurrent requests correctly."""
    port = 8518
    t = threading.Thread(
        target=serve, args=(engine, "127.0.0.1", port),
        kwargs={"max_requests": 3, "batch_window_ms": 1500}, daemon=True)
    t.start()
    import time
    for _ in range(50):  # wait for the socket
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=5) as r:
                body = json.loads(r.read())
            break
        except OSError:
            time.sleep(0.1)
    assert body["batch_window_ms"] == 1500

    outs = {}

    def hit(name):
        outs[name] = _post(port, {"prompts": [name], "seed": 0})

    ts = [threading.Thread(target=hit, args=(n,)) for n in ("x", "y")]
    for th in ts:
        th.start()
    for th in ts:
        th.join(timeout=300)
    for status, body in outs.values():
        assert status == 200
        assert len(body["images"]) == 1
        png = base64.b64decode(body["images"][0])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_metrics_endpoint(server_port):
    # note: server_port's server has already handled requests in the tests
    # above; metrics must reflect a nonzero request count
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server_port}/metrics", timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    vals = {l.split()[0]: float(l.split()[1])
            for l in text.splitlines() if l and not l.startswith("#")}
    assert vals["fgdm_requests_total"] >= 1
    assert vals["fgdm_images_total"] >= 1
    assert vals["fgdm_max_batch"] == 2
    assert vals["fgdm_request_latency_seconds_sum"] > 0
