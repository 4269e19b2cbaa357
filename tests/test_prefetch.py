"""Parallel input pipeline: ordering, determinism, device prefetch."""

import time

import jax
import numpy as np
import pytest

from fgdm_tpu.data.prefetch import (ParallelBatchLoader, device_prefetch)


class FakeDataset:
    """Deterministic synthetic samples; optional per-item latency."""

    def __init__(self, n=32, delay=0.0):
        self.n = n
        self.delay = delay

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.delay:
            time.sleep(self.delay)
        img = np.full((8, 8, 3), i, np.float32)
        return {"image": img, "parts": np.int32(i), "caption": f"cap{i}"}


def _collect(loader, n):
    out = []
    for b in loader:
        out.append(b)
        if len(out) == n:
            break
    return out


def test_order_matches_serial_iterator():
    ds = FakeDataset(32)
    serial = ParallelBatchLoader(ds, 4, shuffle=True, seed=3, epochs=1,
                                 num_workers=1)
    par = ParallelBatchLoader(ds, 4, shuffle=True, seed=3, epochs=1,
                              num_workers=8, prefetch_batches=3)
    bs, bp = _collect(iter(serial), 8), _collect(iter(par), 8)
    assert len(bs) == len(bp) == 8
    for a, b in zip(bs, bp):
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["captions"] == b["captions"]


def test_epochs_and_drop_last():
    ds = FakeDataset(10)
    batches = list(iter(ParallelBatchLoader(ds, 4, shuffle=False, epochs=2,
                                            num_workers=2)))
    # 10//4 = 2 full batches per epoch × 2 epochs
    assert len(batches) == 4
    np.testing.assert_array_equal(batches[0]["parts"], [0, 1, 2, 3])


def test_workers_actually_overlap():
    """8 workers on a 5ms-per-item dataset must beat serial by >2x."""
    ds = FakeDataset(64, delay=0.005)
    t0 = time.perf_counter()
    list(iter(ParallelBatchLoader(ds, 8, shuffle=False, epochs=1,
                                  num_workers=1, prefetch_batches=1)))
    serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    list(iter(ParallelBatchLoader(ds, 8, shuffle=False, epochs=1,
                                  num_workers=8, prefetch_batches=4)))
    par = time.perf_counter() - t0
    assert par < serial / 2, (serial, par)


def test_device_prefetch_places_on_device():
    ds = FakeDataset(16)
    loader = ParallelBatchLoader(ds, 4, shuffle=False, epochs=1,
                                 num_workers=2)
    out = list(device_prefetch(iter(loader), size=2))
    assert len(out) == 4
    assert isinstance(out[0]["image"], jax.Array)
    assert out[0]["captions"] == ["cap0", "cap1", "cap2", "cap3"]
    np.testing.assert_array_equal(
        np.asarray(out[1]["image"][0, 0, 0]), [4, 4, 4])


def test_device_prefetch_shards_over_mesh():
    from fgdm_tpu.parallel.mesh import create_mesh

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = create_mesh(n_data=8, n_model=1)
    ds = FakeDataset(16)
    loader = ParallelBatchLoader(ds, 8, shuffle=False, epochs=1,
                                 num_workers=2)
    out = list(device_prefetch(iter(loader), mesh=mesh, size=1))
    x = out[0]["image"]
    assert len(x.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(x[:, 0, 0, 0]),
                                  np.arange(8, dtype=np.float32))
