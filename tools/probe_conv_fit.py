"""AOT-probe one Pallas conv shape's compile on the TPU compiler.

The scoped-VMEM fit is decided at compile time (stack allocation check), so
``jit(conv3x3).lower().compile()`` classifies a shape as fit/OOM without a
chip run.  One shape per process (the remote compile service can crash on
repeated big compiles per process):

    python tools/probe_conv_fit.py H C CO   # prints one JSON line
"""

import json
import os
import sys
import time

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

h, c, co = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

from fgdm_tpu.kernels.conv import _conv3x3_fwd, _pick_blocks  # noqa: E402

x = jnp.zeros((2, h, h, c), jnp.bfloat16)
w = jnp.zeros((3, 3, c, co), jnp.bfloat16)
b = jnp.zeros((co,), jnp.bfloat16)

bh, bco, modeled = _pick_blocks(h, h, c, co, 2)
t0 = time.time()
try:
    jax.jit(_conv3x3_fwd).lower(x, w, b).compile()
    status, detail = "ok", ""
except Exception as e:  # noqa: BLE001
    msg = str(e)
    status = "vmem_oom" if "vmem" in msg.lower() else "error"
    detail = msg[:200]
print(json.dumps({
    "h": h, "c": c, "co": co, "bh": bh, "bco": bco,
    "modeled_mb": round(modeled / 2**20, 2), "status": status,
    "compile_s": round(time.time() - t0, 1), "detail": detail,
}))
