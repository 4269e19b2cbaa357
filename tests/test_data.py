"""Data pipeline tests: codecs, dataset, batching (synthetic COCO tree)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from fgdm_tpu.data import colorize as cz
from fgdm_tpu.data.dataset import SemanticDataset, batch_iterator, load_data


def test_color_map_matches_reference_bit_pattern():
    """Vectorized palette must equal the reference's per-bit loop
    (semantic.py:64-83) — recomputed here as the oracle."""
    def ref_color_map(N):
        def bitget(v, i):
            return (v & (1 << i)) != 0
        cmap = np.zeros((N, 3), dtype="uint8")
        for i in range(N):
            r = g = b = 0
            c = i
            for j in range(8):
                r = r | (bitget(c, 0) << 7 - j)
                g = g | (bitget(c, 1) << 7 - j)
                b = b | (bitget(c, 2) << 7 - j)
                c = c >> 3
            cmap[i] = np.array([r, g, b])
        return cmap

    np.testing.assert_array_equal(cz.color_map(256), ref_color_map(256))


def test_colorize_decolorize_roundtrip():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 150, (2, 32, 32)).astype(np.int32)
    cmap = cz.color_map(150)
    rgb = cz.colorize(labels, cmap)
    back = cz.decolorize(rgb, cmap)
    np.testing.assert_array_equal(back, labels)


def test_void_handling():
    labels = np.full((4, 4), 255, np.int32)
    rgb = cz.colorize(labels, cz.color_map(10))
    np.testing.assert_array_equal(rgb, 255)  # void → white
    # white is not in the palette → decodes back to void
    back = cz.decolorize(rgb, cz.color_map(10))
    np.testing.assert_array_equal(back, 255)


def test_ade_palette_and_mapping():
    cmap = cz.ade_cmap()
    assert cmap.shape == (151, 3)
    ade = cz.coco_to_ade_labels(np.array([0, 1, 2]))
    assert ade.tolist() == [12, 127, 20]  # reference mapping values


def test_nearest_palette_decolorize_robust():
    cmap = cz.color_map(20)
    labels = np.arange(20).reshape(4, 5).astype(np.int32)
    rgb = cz.colorize(labels, cmap).astype(np.int32)
    noisy = np.clip(rgb + 1, 0, 255)  # off-palette by 1
    back = cz.nearest_palette_decolorize(noisy, cmap)
    assert (back == labels).mean() > 0.9


@pytest.fixture(scope="module")
def coco_tree(tmp_path_factory):
    """Synthetic COCO-layout directory with 4 images + captions."""
    root = tmp_path_factory.mktemp("coco")
    rng = np.random.default_rng(0)
    img_dir = root / "images" / "train2017"
    ann_dir = root / "annotations" / "train2017"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    anns = []
    for i in range(4):
        img = rng.integers(0, 255, (73, 91, 3)).astype(np.uint8)
        lab = rng.integers(0, 20, (73, 91)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:012d}.jpg")
        Image.fromarray(lab).save(ann_dir / f"{i:012d}.png")
        anns.append({"image_id": i, "caption": f"caption number {i}"})
    (root / "annotations").mkdir(exist_ok=True)
    with open(root / "annotations" / "captions_train2017.json", "w") as f:
        json.dump({"annotations": anns}, f)
    return str(root)


def test_load_data_coco(coco_tree):
    ds = load_data("coco", coco_tree, image_size=32, random_crop=True,
                   is_train=True)
    assert len(ds) == 4
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["image"].dtype == np.float32
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["parts"].shape == (32, 32)
    assert item["caption"].startswith("caption number")
    # coco void remap: 255 → 182
    assert not np.any(item["parts"] == 255)


def test_batch_iterator(coco_tree):
    ds = load_data("coco", coco_tree, image_size=32, is_train=True)

    def fake_tokenizer(texts):
        return np.zeros((len(texts), 77), np.int32)

    it = batch_iterator(ds, batch_size=2, tokenizer=fake_tokenizer, epochs=1)
    batches = list(it)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["input_ids"].shape == (2, 77)


def test_eval_resize_path(coco_tree):
    # is_train with crop/flip off exercises the deterministic resize path
    # (the fixture only materializes the train2017 split)
    ds = load_data("coco", coco_tree, image_size=32, is_train=True,
                   random_crop=False, random_flip=False)
    a = ds[0]["image"]
    b = ds[0]["image"]
    np.testing.assert_array_equal(a, b)  # deterministic without aug


def test_make_real_data_builds_loadable_coco_tree(tmp_path):
    """tools/make_real_data.py emits a COCO-layout tree of REAL photos that
    load_data('coco') consumes: aligned image/label pairs, captions wired
    by image id, labels confined to COCO-stuff id range."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = tmp_path / "realcoco"
    subprocess.run(
        [sys.executable, os.path.join(root, "tools", "make_real_data.py"),
         "--out", str(out), "--crops", "2", "--size", "64"],
        check=True, cwd=root, timeout=300)
    ds = load_data("coco", str(out), 32, use_ade_colormap=True,
                   random_crop=False, random_flip=False)
    assert len(ds) >= 4  # ≥2 photos × 2 crops
    item = ds[0]
    assert item["image"].shape == (32, 32, 3)
    assert item["caption"]  # real caption text attached
    assert 0 <= int(item["label"].min()) and int(item["label"].max()) <= 182
    # val split exists and loads too
    val = load_data("coco", str(out), 32, is_train=False, random_crop=False,
                    random_flip=False, use_ade_colormap=True)
    assert len(val) >= 2
