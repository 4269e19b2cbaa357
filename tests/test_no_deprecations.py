"""Canary: importing the whole framework must not trip jax deprecation
warnings.

Round-4 lesson: `jax.experimental.shard_map` deprecated under jax 0.8 and
was one bump away from breaking every context-parallel path (it survived
to 0.9 but with a renamed kwarg).  This test walks every fgdm_tpu module
in a FRESH interpreter (deprecation warnings fire once per process at
attribute-access time, so an in-process import could be masked by an
earlier test) and fails on any DeprecationWarning originating from jax.
"""

import subprocess
import sys

_SCRIPT = r"""
import os, warnings
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import importlib, pkgutil
import fgdm_tpu

failures = []
with warnings.catch_warnings(record=True) as caught:
    warnings.simplefilter("always")
    for mod in pkgutil.walk_packages(fgdm_tpu.__path__, "fgdm_tpu."):
        try:
            importlib.import_module(mod.name)
        except ImportError:
            pass  # optional deps (gated elsewhere)
for w in caught:
    if not issubclass(w.category, DeprecationWarning):
        continue
    msg = str(w.message)
    if "jax" in msg.lower() or "jax" in (w.filename or ""):
        failures.append(f"{w.filename}:{w.lineno}: {msg}")
if failures:
    print("JAX DEPRECATIONS FOUND:")
    for f in failures:
        print(" ", f)
    raise SystemExit(1)
print("no jax deprecation warnings across", "fgdm_tpu")
"""


def test_no_jax_deprecation_warnings():
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, (
        f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    )
