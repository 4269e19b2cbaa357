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


class RngDataset(FakeDataset):
    """Dataset whose samples depend on per-sample augmentation RNG via the
    ``sample(idx, salt)`` protocol — the shape that caught the shared-Random
    thread race (advisor r2): a shared generator makes augmentations depend
    on thread interleaving."""

    def __init__(self, n=32, seed=7):
        super().__init__(n)
        self.seed = seed

    def sample(self, i, salt=0):
        import random

        rng = random.Random((self.seed * 1009 + salt) * 1013 + i)
        img = np.full((8, 8, 3), i + rng.random(), np.float32)
        return {"image": img, "parts": np.int32(i), "caption": f"cap{i}"}

    def __getitem__(self, i):
        return self.sample(i)


def test_augmentation_rng_deterministic_across_worker_counts():
    ds = RngDataset(32)
    a = _collect(iter(ParallelBatchLoader(ds, 4, shuffle=True, seed=3,
                                          epochs=2, num_workers=1)), 12)
    b = _collect(iter(ParallelBatchLoader(ds, 4, shuffle=True, seed=3,
                                          epochs=2, num_workers=8,
                                          prefetch_batches=6)), 12)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["image"], y["image"])
    # epoch is the RNG salt: the same index drawn in epoch 2 must get fresh
    # augmentation (batches 0-7 are epoch 1, 8-11 epoch 2 for n=32/bs=4)
    e1 = np.sort(np.concatenate([x["image"][:, 0, 0, 0] for x in a[:8]]))
    e2 = np.sort(np.concatenate([x["image"][:, 0, 0, 0] for x in a[8:]]))
    assert not np.array_equal(e1[:16], e2)


def test_semantic_dataset_rng_is_per_sample(tmp_path):
    """SemanticDataset augmentations must be a pure function of
    (seed, salt, idx) — same item fetched twice or out of order is
    bit-identical."""
    from PIL import Image

    from fgdm_tpu.data.dataset import SemanticDataset

    rng = np.random.default_rng(0)
    imgs, labs = [], []
    for i in range(4):
        ip = tmp_path / f"im{i}.png"
        lp = tmp_path / f"lb{i}.png"
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), np.uint8)).save(ip)
        Image.fromarray(rng.integers(0, 5, (48, 64), np.uint8)).save(lp)
        imgs.append(str(ip))
        labs.append(str(lp))
    ds = SemanticDataset("coco", 32, imgs, labs, seed=11,
                         captions={imgs[0]: ["a", "b", "c"]})
    first = [ds.sample(i, salt=5) for i in range(4)]
    again = [ds.sample(i, salt=5) for i in reversed(range(4))][::-1]
    for x, y in zip(first, again):
        np.testing.assert_array_equal(x["image"], y["image"])
        assert x["caption"] == y["caption"]
    # different salt (epoch) gives a different augmentation stream
    other = ds.sample(0, salt=6)
    assert (other["image"] != first[0]["image"]).any() or \
        other["caption"] != first[0]["caption"]


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
