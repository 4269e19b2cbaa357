"""Persistent XLA compilation cache wiring.

The fused chain is a huge program; the TPU remote compiler takes minutes
on a cold cache (measured fresh-cache fused compiles: 102-409 s; staged
~176 s; warm ~111 s including execution).  Every entry point that compiles
production-geometry programs (bench, server, tools) should call
:func:`enable_persistent_cache` so a single warmup pays the wall once per
workspace — ``tools/warm_cache.py`` does exactly that offline.

Cache hits are keyed on the exact HLO + compiler flags, so a warmer must
compile the *same* programs (same model defs/dtypes, batch, step counts,
samplers, shardings) the serving process will request.
"""

from __future__ import annotations

import os
import warnings

import jax

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 10.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Resolution order: explicit arg > ``FGDM_CACHE_DIR`` env > ``.jax_cache``
    at the repo root.  Safe to call multiple times; returns the directory.
    ``FGDM_CACHE_DIR=off`` disables (returns "")."""
    env = os.environ.get("FGDM_CACHE_DIR")
    if env == "off":
        return ""
    path = cache_dir or env or DEFAULT_CACHE_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception as e:
        # fail soft (a cold compile still works) but never silently: the
        # whole point of this module is avoiding the multi-minute wall
        warnings.warn(
            f"persistent compile cache could not be enabled at {path}: {e!r}"
            " — every fresh process will pay the full cold compile",
            stacklevel=2)
        return ""
    return path
