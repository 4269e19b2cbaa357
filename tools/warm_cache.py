"""Offline serving warmup: compile the server's chain programs and seed the
persistent ``.jax_cache`` so the first real request pays ~warm cost.

Cold-start on a fresh workspace is the one serving latency the engine can't
hide (fresh-cache fused compiles measured 102-409 s, staged ~176 s; warm
~111 s).  This tool builds the exact programs ``fgdm_tpu.server`` will
request — same model definitions (SD-1.5 geometry, bf16 compute), same
batch, step counts, samplers, and staging — through the same code path
(``ChainEngine``), so the cache keys match byte-for-byte.  Weights are
irrelevant to compilation: the engine is built with the loader's
uninitialized params.

Usage (mirror the server flags you will launch with):

    python tools/warm_cache.py --max_batch 4 --staged --f1_steps 50
    python tools/warm_cache.py --no-staged          # fused program too
    FGDM_CACHE_DIR=/path python tools/warm_cache.py  # custom cache dir

Then start the server normally; it reads the same cache.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from fgdm_tpu.utils.cache import enable_persistent_cache  # noqa: E402

_CACHE = enable_persistent_cache()


def cache_stats(path: str):
    if not path or not os.path.isdir(path):
        return 0, 0.0
    names = [n for n in os.listdir(path)
             if os.path.isfile(os.path.join(path, n))]
    size = sum(os.path.getsize(os.path.join(path, n)) for n in names)
    return len(names), size / 1e6


def main(argv=None):
    p = argparse.ArgumentParser(
        description="compile server chain programs into the persistent "
                    "compilation cache")
    p.add_argument("--max_batch", type=int, default=4)
    p.add_argument("--staged", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="warm the four stage programs (server default); "
                        "--no-staged warms the single fused program")
    p.add_argument("--f1_steps", type=int, default=50)
    p.add_argument("--f2_steps", type=int, default=20)
    p.add_argument("--f1_sampler", type=str, default="ddim",
                   choices=("ddim", "plms", "dpm"))
    p.add_argument("--f2_sampler", type=str, default="ddim",
                   choices=("ddim", "plms", "dpm"))
    p.add_argument("--both", action="store_true",
                   help="warm staged AND fused variants")
    opt = p.parse_args(argv)

    from fgdm_tpu.checkpoint.loader import load_controlnet, load_fgdm
    from fgdm_tpu.serving import ChainEngine

    n0, mb0 = cache_stats(_CACHE)
    print(f"[warm] cache {_CACHE or '(disabled)'}: {n0} entries, "
          f"{mb0:.1f} MB; backend={jax.default_backend()}")

    ld = load_fgdm(None, verbose=False)
    cldm = load_controlnet(None, verbose=False)

    variants = [opt.staged] if not opt.both else [True, False]
    for staged in variants:
        t0 = time.perf_counter()
        ChainEngine(ld, cldm, max_batch=opt.max_batch, staged=staged,
                    f1_steps=opt.f1_steps, f2_steps=opt.f2_steps,
                    f1_sampler=opt.f1_sampler, f2_sampler=opt.f2_sampler,
                    warmup=True)
        dt = time.perf_counter() - t0
        print(f"[warm] {'staged' if staged else 'fused'} compile+run: "
              f"{dt:.1f}s")

    n1, mb1 = cache_stats(_CACHE)
    print(f"[warm] cache now: {n1} entries (+{n1 - n0}), {mb1:.1f} MB")


if __name__ == "__main__":
    main()
