"""Assemble a small REAL-image COCO-layout dataset for training smokes.

This zero-egress environment ships no COCO download, but it does carry real
photographs: scikit-learn's two sample photos (china.jpg — a temple, and
flower.jpg) and the reference repo's ``data/arch.jpg``.  This tool turns
them into the exact on-disk layout ``data/dataset.py::load_data("coco")``
expects (``images/train2017/{id:012d}.jpg`` + ``annotations/train2017``
L-mode label PNGs + ``annotations/captions_train2017.json``):

* each photo is expanded into overlapping crops (distinct files, so the
  loader's shuffle sees a real file population; SemanticDataset adds its
  own random crop/flip on top),
* label maps are UNSUPERVISED color segments — k-means over Lab pixels,
  cleaned with a median filter, with clusters mapped to fixed COCO-stuff
  ids per photo.  They are honest real-image segmentations in the
  geometric sense (region structure follows actual image content) but NOT
  semantic ground truth; good for optimization smokes, meaningless for
  mIoU.
* captions are hand-written, honest descriptions of each photograph.

Usage:  python tools/make_real_data.py [--out /tmp/fgdm_real_coco]
                                       [--crops 16] [--size 512]
"""

import argparse
import json
import os

import numpy as np


def photo_sources():
    """(name, HWC uint8 RGB, captions, cluster→COCO-stuff id map)."""
    from sklearn.datasets import load_sample_images

    imgs = load_sample_images()
    by_name = dict(zip([os.path.basename(f) for f in imgs.filenames],
                       imgs.images))
    srcs = [
        ("china", np.asarray(by_name["china.jpg"], np.uint8), [
            "a pagoda temple surrounded by trees in china",
            "an ancient chinese temple with a tiered roof among green trees",
            "a photograph of a pagoda and gardens on a sunny day",
        ], [105, 128, 93, 119, 96, 168]),   # tree/roof/building-ish stuff ids
        ("flower", np.asarray(by_name["flower.jpg"], np.uint8), [
            "a close-up photograph of a purple flower",
            "a macro photo of a blooming purple flower with green leaves",
            "a single purple blossom against blurred foliage",
        ], [118, 96, 141, 119, 93, 105]),
    ]
    arch = "/root/reference/data/arch.jpg"
    if os.path.exists(arch):
        from PIL import Image

        srcs.append(
            ("arch", np.asarray(Image.open(arch).convert("RGB")), [
                "a natural stone arch in a desert landscape",
                "a photograph of a rock archway under a blue sky",
                "a sandstone arch formation in a national park",
            ], [156, 125, 149, 134, 105, 96]))
    return srcs


def kmeans_labels(rgb: np.ndarray, k: int, id_map, seed: int) -> np.ndarray:
    """Unsupervised color segmentation → COCO-stuff-id L map (uint8)."""
    import cv2

    lab = cv2.cvtColor(rgb, cv2.COLOR_RGB2LAB).reshape(-1, 3).astype(
        np.float32)
    # spatial coordinates keep segments contiguous-ish
    h, w = rgb.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    feats = np.concatenate(
        [lab, 0.3 * yy.reshape(-1, 1), 0.3 * xx.reshape(-1, 1)], axis=1)
    crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 20, 1.0)
    cv2.setRNGSeed(seed)
    _, lbl, _ = cv2.kmeans(feats, k, None, crit, 3,
                           cv2.KMEANS_PP_CENTERS)
    lbl = lbl.reshape(h, w).astype(np.uint8)
    lbl = cv2.medianBlur(lbl, 5)
    out = np.zeros_like(lbl)
    for c in range(k):
        out[lbl == c] = id_map[c % len(id_map)]
    return out


def crops(rgb: np.ndarray, n: int, rng) -> list:
    """Random square crop boxes, 60-100% of the photo's short side.

    Crop geometry is independent of the output resolution — ``--size``
    only sets the resize target applied afterwards."""
    h, w = rgb.shape[:2]
    side = min(h, w)
    out = []
    for _ in range(n):
        s = int(side * rng.uniform(0.6, 1.0))
        y = rng.integers(0, h - s + 1)
        x = rng.integers(0, w - s + 1)
        out.append((int(y), int(x), int(s)))
    return out


def main(argv=None):
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/fgdm_real_coco")
    p.add_argument("--crops", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--k", type=int, default=6)
    opt = p.parse_args(argv)

    rng = np.random.default_rng(0)
    srcs = [(name, rgb, caps, kmeans_labels(rgb, opt.k, id_map, seed=0))
            for name, rgb, caps, id_map in photo_sources()]
    for split, n_crops in (("train2017", opt.crops),
                           ("val2017", max(2, opt.crops // 8))):
        img_dir = os.path.join(opt.out, "images", split)
        ann_dir = os.path.join(opt.out, "annotations", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        anns, img_id = [], 0
        for name, rgb, captions, labels in srcs:
            for (y, x, s) in crops(rgb, n_crops, rng):
                im = Image.fromarray(rgb[y:y + s, x:x + s]).resize(
                    (opt.size, opt.size), Image.BICUBIC)
                lb = Image.fromarray(labels[y:y + s, x:x + s], "L").resize(
                    (opt.size, opt.size), Image.NEAREST)
                im.save(os.path.join(img_dir, f"{img_id:012d}.jpg"),
                        quality=95)
                lb.save(os.path.join(ann_dir, f"{img_id:012d}.png"))
                for c in captions:
                    anns.append({"image_id": img_id, "caption": c})
                img_id += 1
        with open(os.path.join(opt.out, "annotations",
                               f"captions_{split}.json"), "w") as f:
            json.dump({"annotations": anns}, f)
        print(f"[real-data] {split}: {img_id} real-photo crops + label maps "
              f"+ {len(anns)} captions under {opt.out}")


if __name__ == "__main__":
    main()
