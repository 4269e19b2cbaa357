"""Annotator tests: HED, PiDiNet (incl. PDC kernel math vs torch), canny,
MiDaS DPT structure + depth→normal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fgdm_tpu.annotators.canny import CannyDetector, sobel_edges
from fgdm_tpu.annotators.hed import ControlNetHED
from fgdm_tpu.annotators.midas import DPTHybrid, depth_to_normal
from fgdm_tpu.annotators.pidinet import (
    CARV4,
    PiDiNet,
    transform_pdc_kernel,
)


def test_hed_shapes_and_range():
    hed = ControlNetHED()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    params = hed.init(jax.random.PRNGKey(1), x)
    out = hed.apply(params, x)
    assert out.shape == (1, 64, 64, 3)
    o = np.asarray(out)
    assert o.min() >= -1 and o.max() <= 1
    # 3 channels identical (replicated gray edge map)
    np.testing.assert_array_equal(o[..., 0], o[..., 1])


def _torch_pdc(x, w, pdc):
    """Reference pixel-difference conv semantics (model_edge.py:270-321),
    recomputed with torch as the oracle."""
    if pdc == "cv":
        return F.conv2d(x, w, padding=1)
    if pdc == "cd":
        wc = w.sum(dim=[2, 3], keepdim=True)
        return F.conv2d(x, w, padding=1) - F.conv2d(x, wc, padding=0)
    if pdc == "ad":
        shape = w.shape
        wf = w.view(shape[0], shape[1], -1)
        wconv = (wf - wf[:, :, [3, 0, 1, 6, 4, 2, 7, 8, 5]]).view(shape)
        return F.conv2d(x, wconv, padding=1)
    if pdc == "rd":
        shape = w.shape
        buffer = torch.zeros(shape[0], shape[1], 25)
        wf = w.view(shape[0], shape[1], -1)
        buffer[:, :, [0, 2, 4, 10, 14, 20, 22, 24]] = wf[:, :, 1:]
        buffer[:, :, [6, 7, 8, 11, 13, 16, 17, 18]] = -wf[:, :, 1:]
        buffer[:, :, 12] = 0
        return F.conv2d(x, buffer.view(shape[0], shape[1], 5, 5), padding=2)
    raise ValueError(pdc)


@pytest.mark.parametrize("pdc", ["cv", "cd", "ad", "rd"])
def test_pdc_kernel_transform_matches_torch(pdc, np_rng):
    """Our kernel-transform + standard conv must equal the reference's
    custom conv ops exactly."""
    w = np_rng.standard_normal((6, 5, 3, 3)).astype(np.float32)  # OIHW
    x = np_rng.standard_normal((2, 5, 12, 12)).astype(np.float32)  # NCHW
    ref = _torch_pdc(torch.from_numpy(x), torch.from_numpy(w), pdc).numpy()

    w_hwio = jnp.asarray(w.transpose(2, 3, 1, 0))
    keff = transform_pdc_kernel(w_hwio, pdc)
    pad = keff.shape[0] // 2
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), keff, (1, 1),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


def test_pidinet_forward():
    net = PiDiNet(inplane=12, dil=8)  # small variant for test speed
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3),
                           minval=-1, maxval=1)
    params = net.init(jax.random.PRNGKey(1), x)
    out = net.apply(params, x)
    assert out.shape == (1, 32, 32, 3)
    vals = np.unique(np.asarray(out))
    assert set(vals.tolist()) <= {-1.0, 1.0}  # binarized edges
    assert len(CARV4) == 16


def test_canny_and_sobel():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, 16:] = 255
    edges = CannyDetector()(img)
    assert edges.shape == (32, 32)
    assert edges[:, 15:17].max() == 255  # edge at the step

    jimg = jnp.asarray(img.astype(np.float32) / 127.5 - 1.0)[None]
    se = sobel_edges(jimg)
    assert se.shape == (1, 32, 32, 1)
    assert float(se[:, :, 15:17].max()) == 1.0


def test_dpt_hybrid_structure():
    net = DPTHybrid(embed_dim=32, num_layers=2, num_heads=4, hooks=(0, 1),
                    features=16)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    depth = net.apply(params, x)
    assert depth.shape == (1, 64, 64)  # full input resolution
    assert np.all(np.asarray(depth) >= 0)


def test_depth_to_normal():
    yy = jnp.linspace(0, 1, 16)
    depth = jnp.broadcast_to(yy[None, :, None], (1, 16, 16)).transpose(0, 2, 1)
    n = depth_to_normal(depth + 0.5)  # offset above bg threshold
    assert n.shape == (1, 16, 16, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
