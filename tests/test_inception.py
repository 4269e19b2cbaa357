"""InceptionV3 FID backend: schema, forward, ingest, torch-math oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.utils.fid import FeatureStats, compute_fid, frechet_distance
from fgdm_tpu.utils.inception import (
    _avg_pool_fid,
    _basic_conv,
    expected_inception_keys,
    inception_feature_fn,
    inception_pool3,
    ingest_inception,
    init_inception_params,
)


def test_expected_key_schema():
    keys = expected_inception_keys()
    # 5 stem + 3×7 A + 4 B + 4×10 C + 6 D + 2×9 E = 94 BasicConv2d × 5 keys
    assert len(keys) == 94 * 5
    assert "Conv2d_1a_3x3.conv.weight" in keys
    assert "Mixed_7c.branch_pool.bn.running_var" in keys
    assert "Mixed_6b.branch7x7dbl_5.conv.weight" in keys


def test_forward_shape_and_finite():
    params = init_inception_params()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 299, 299, 3)),
        jnp.float32)
    feats = inception_pool3(params, x)
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))
    # different images → different features
    assert float(jnp.std(feats[0] - feats[1])) > 0


def test_ingest_round_trip():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    shapes = init_inception_params()
    sd = {}
    for name in expected_inception_keys():
        arr = rng.standard_normal(shapes[name].shape).astype(np.float32)
        if name.endswith(".conv.weight"):
            arr = arr.transpose(3, 2, 0, 1)  # store as torch OIHW
        else:
            arr = np.abs(arr) + 0.1 if "running_var" in name else arr
        sd[name] = torch.from_numpy(arr)
    sd["fc.weight"] = torch.zeros(1008, 2048)  # ignored extras
    sd["Mixed_5b.branch1x1.bn.num_batches_tracked"] = torch.tensor(3)
    params = ingest_inception(sd)
    w = np.asarray(params["Conv2d_1a_3x3.conv.weight"])
    assert w.shape == (3, 3, 3, 32)
    np.testing.assert_allclose(
        w, sd["Conv2d_1a_3x3.conv.weight"].numpy().transpose(2, 3, 1, 0))
    # missing keys are an explicit error (strict contract)
    with pytest.raises(KeyError):
        ingest_inception({"Conv2d_1a_3x3.conv.weight": sd["Conv2d_1a_3x3.conv.weight"]})


def test_basic_conv_matches_torch_math():
    """conv+BN(eps 1e-3)+relu vs torch.nn.functional reference numerics."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    cin, cout = 5, 7
    w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32) * 0.1
    g = rng.standard_normal(cout).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    m = rng.standard_normal(cout).astype(np.float32)
    v = np.abs(rng.standard_normal(cout)).astype(np.float32) + 0.5
    x = rng.standard_normal((2, 9, 9, cin)).astype(np.float32)

    params = {
        "blk.conv.weight": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "blk.bn.weight": jnp.asarray(g),
        "blk.bn.bias": jnp.asarray(b),
        "blk.bn.running_mean": jnp.asarray(m),
        "blk.bn.running_var": jnp.asarray(v),
    }
    got = np.asarray(_basic_conv(params, "blk", jnp.asarray(x),
                                 stride=2, padding=((1, 1), (1, 1))))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.conv2d(xt, torch.from_numpy(w), stride=2, padding=1)
    yt = F.batch_norm(yt, torch.from_numpy(m), torch.from_numpy(v),
                      torch.from_numpy(g), torch.from_numpy(b),
                      training=False, eps=1e-3)
    yt = F.relu(yt).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, yt, atol=2e-5, rtol=1e-5)


def test_avg_pool_fid_matches_torch():
    """count_include_pad=False pooling — the FID-variant detail."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.default_rng(3).standard_normal((1, 6, 6, 4)).astype(np.float32)
    got = np.asarray(_avg_pool_fid(jnp.asarray(x)))
    ref = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3,
                       stride=1, padding=1, count_include_pad=False)
    np.testing.assert_allclose(got, ref.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_inception_fid_pipeline():
    """feature_fn plugs into compute_fid; FID(x, x) == 0."""
    params = init_inception_params()
    fn, dim = inception_feature_fn(params)
    assert dim == 2048
    rng = np.random.default_rng(4)
    imgs = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    other = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    fid_same = compute_fid([imgs], [imgs], fn, dim)
    fid_diff = compute_fid([imgs], [other], fn, dim)
    assert abs(fid_same) < 1e-3
    assert np.isfinite(fid_diff)
