"""UNet structural tests: shapes, adapter injection, teacher path, capture."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.models.unet import UNetModel

TINY = dict(
    model_channels=32, num_heads=4, context_dim=64,
    channel_mult=(1, 2), attention_resolutions=(1, 2),
    num_res_blocks=1, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = UNetModel(**TINY)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([3, 5])
    ctx = jnp.zeros((2, 77, 64))
    params = unet.init(rng, x, t, ctx)
    # A fresh UNet outputs exactly 0 (zero-init head conv, matching the
    # reference's zero_module).  Randomize zero-init kernels so behavioural
    # tests can distinguish code paths.
    params = jax.tree_util.tree_map_with_path(
        lambda path, p: (
            jax.random.normal(jax.random.PRNGKey(hash(str(path)) % 2**31),
                              p.shape, p.dtype) * 0.02
            if np.all(np.asarray(p) == 0) and p.ndim >= 2
            else p
        ),
        params,
    )
    return unet, params


def test_forward_shape(tiny_unet):
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    out = unet.apply(params, x, jnp.array([1, 2]), jnp.zeros((2, 77, 64)))
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_adapter_changes_output(tiny_unet):
    """Adapter (self-prompting) vs teacher path must differ; with a pcond
    the adapter must consume it."""
    unet, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.array([7])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 64))
    with_adapter = unet.apply(params, x, t, ctx)
    teacher = unet.apply(params, x, t, ctx, adapter_on=False)
    assert not np.allclose(np.asarray(with_adapter), np.asarray(teacher))
    pcond = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4))
    with_pcond = unet.apply(params, x, t, ctx, pcond=pcond)
    assert not np.allclose(np.asarray(with_adapter), np.asarray(with_pcond))


def test_adapter_param_namespace(tiny_unet):
    """Adapter params live under a dedicated 'adapter' scope — the contract
    used by adapter-only optimization (reference trains params whose name
    contains 'adapter', ddpm.py:1611-1616)."""
    _, params = tiny_unet
    assert "adapter" in params["params"]


def test_capture_maps(tiny_unet):
    unet, params = tiny_unet
    x = jnp.zeros((2, 16, 16, 4))
    out, sa, ca = unet.apply(
        params, x, jnp.array([1, 2]), jnp.zeros((2, 77, 64)), capture=True
    )
    assert out.shape == (2, 16, 16, 4)
    # tiny config: attn at both levels → input 1,3 / middle / output 0..3
    assert "middle_block.1" in sa
    for k, v in sa.items():
        assert v.shape[1] == v.shape[2]  # self-attn square maps
    for k, v in ca.items():
        assert v.shape[2] == 77  # cross-attn over text tokens


def test_sd_config_layer_count():
    """Full SD-1.4 config builds with the 12/1/12 block layout and the
    4-scale adapter (openaimodel.py:439-734 + 548-556)."""
    unet = UNetModel(dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    # shape-only init: the full 860M-param model never materializes
    params = jax.eval_shape(lambda: unet.init(rng, x, t, ctx))
    p = params["params"]
    input_blocks = {k for k in p if k.startswith("input_blocks")}
    output_blocks = {int(k.split("_")[2]) for k in p if k.startswith("output_blocks")}
    assert {int(k.split("_")[2]) for k in input_blocks} == set(range(12))
    assert output_blocks == set(range(12))
    assert "middle_block_1" in p and "adapter" in p
    # adapter pyramid channels 320/640/1280/1280
    assert p["adapter"]["body_0"]["block1"]["kernel"].shape[-1] == 320
    assert p["adapter"]["body_7"]["block1"]["kernel"].shape[-1] == 1280


def test_time_adapter():
    unet = UNetModel(**{**TINY, "use_time_adapter": True})
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 4))
    params = unet.init(rng, x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 64)))
    out = unet.apply(params, x, jnp.array([5]), jnp.zeros((1, 77, 64)))
    assert out.shape == (1, 16, 16, 4)
