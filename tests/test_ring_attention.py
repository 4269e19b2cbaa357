"""Ring attention: exactness vs single-device attention on the 8-dev mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.kernels.attention import _xla_attention
from fgdm_tpu.parallel.mesh import create_mesh
from fgdm_tpu.parallel.ring_attention import ring_attention


@pytest.mark.parametrize("nq", [256, 1024])
def test_ring_matches_full_attention(nq, np_rng):
    mesh = create_mesh(n_data=8)
    q = jnp.asarray(np_rng.standard_normal((2, 4, nq, 32)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((2, 4, nq, 32)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((2, 4, nq, 32)), jnp.float32)
    ref = _xla_attention(q, k, v, 32**-0.5)
    with mesh:
        out = ring_attention(q, k, v, mesh, axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_under_jit(np_rng):
    mesh = create_mesh(n_data=8)
    q = jnp.asarray(np_rng.standard_normal((1, 2, 512, 16)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((1, 2, 512, 16)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((1, 2, 512, 16)), jnp.float32)

    @jax.jit
    def run(q, k, v):
        return ring_attention(q, k, v, mesh, axis="data")

    ref = _xla_attention(q, k, v, 16**-0.5)
    np.testing.assert_allclose(np.asarray(run(q, k, v)), np.asarray(ref),
                               atol=2e-5)


def test_ring_on_model_axis(np_rng):
    """Works on any mesh axis — here 'model' of a 4x2 mesh."""
    mesh = create_mesh(n_data=4, n_model=2)
    q = jnp.asarray(np_rng.standard_normal((1, 2, 128, 16)), jnp.float32)
    k = jnp.asarray(np_rng.standard_normal((1, 2, 128, 16)), jnp.float32)
    v = jnp.asarray(np_rng.standard_normal((1, 2, 128, 16)), jnp.float32)
    with mesh:
        out = ring_attention(q, k, v, mesh, axis="model")
    ref = _xla_attention(q, k, v, 16**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
