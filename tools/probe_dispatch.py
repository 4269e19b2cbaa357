"""Measure per-call dispatch overhead vs. argument-buffer count.

probe_decode.py (VAE params only, ~150 leaves) measures the batch-4
decode at 168 ms while profile_chain.py (full cldm pytree, ~2900 leaves)
measures the identical math at 300 ms, and batch-1 decode costs 116 ms —
a large batch-independent floor.  Hypothesis: each execution marshals
every argument buffer through the axon tunnel, so per-call cost grows
with leaf count, not compute.

Times a trivial program (sum of a tiny slice of every leaf) against
pytrees of increasing leaf counts.  Prints one JSON line per size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (persistent compile cache)
bench.enable_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _force(out):
    float(jnp.asarray(out).reshape(-1)[0])


def timed(fn, args, iters=5):
    out = fn(*args)
    _force(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _force(out)
        times.append(time.perf_counter() - t0)
    return min(times) * 1e3


def main():
    salt = (os.getpid() * 1000003 + int(time.time())) % (1 << 20)
    key = jax.random.PRNGKey(salt)
    for n_leaves in (1, 64, 256, 1024, 2900):
        leaves = [jax.random.normal(jax.random.fold_in(key, i), (128,))
                  for i in range(n_leaves)]
        leaves = [jax.device_put(x) for x in leaves]

        @jax.jit
        def f(leaves, z):
            s = z
            for x in leaves:
                s = s + x[0]
            return s

        z = jnp.float32(salt)
        ms = timed(f, (leaves, z))
        print(json.dumps({"n_leaves": n_leaves, "ms_per_call": round(ms, 3)}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
