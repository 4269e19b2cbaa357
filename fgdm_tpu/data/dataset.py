"""Semantic-segmentation dataset pipeline (COCO / ADE20k / cityscapes /
celeba / sample modes).

Mirrors `/root/reference/ldm/data/semantic.py:86-695` behaviourally:
``load_data`` resolves per-mode file lists; ``SemanticDataset.__getitem__``
loads RGB + label PNG, applies the BOX-prefilter + bicubic resize /
random-crop / flip pipeline (`semantic.py:698-800`), **colorizes the label
map** (the colorized seg map IS the ``image`` key for FG-DM-Seg training),
and attaches a COCO caption.  Captions are parsed straight from
``captions_*2017.json`` with the stdlib (no pycocotools dependency).

TPU-first additions: ``batch_iterator`` yields NHWC numpy batches with
tokenized captions ready for ``shard_batch`` onto the mesh, with
double-buffered host→device prefetch.
"""

from __future__ import annotations

import json
import math
import os
import random
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from fgdm_tpu.data.colorize import ade_cmap, color_map, coco_to_ade_labels
from fgdm_tpu.data.colorize import colorize as _np_colorize


def colorize(labels, cmap):
    """Prefer the native C++ codec when built (≈8× at 512²)."""
    from fgdm_tpu.data import native

    labels = np.asarray(labels)
    if native.HAS_NATIVE and labels.min() >= 0 and labels.max() < 256:
        return native.colorize(labels.astype(np.uint8), cmap)
    return _np_colorize(labels, cmap)

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

IMG_EXTS = ("jpg", "jpeg", "png", "gif")


def list_image_files(data_dir: str) -> List[str]:
    results: List[str] = []
    for entry in sorted(os.listdir(data_dir)):
        full = os.path.join(data_dir, entry)
        ext = entry.rsplit(".", 1)[-1].lower() if "." in entry else ""
        if ext in IMG_EXTS:
            results.append(full)
        elif os.path.isdir(full):
            results.extend(list_image_files(full))
    return results


def load_coco_captions(data_dir: str, is_train: bool) -> Dict[str, List[str]]:
    """image path → captions, from captions_{train,val}2017.json."""
    split = "train2017" if is_train else "val2017"
    ann = os.path.join(data_dir, "annotations", f"captions_{split}.json")
    with open(ann) as f:
        payload = json.load(f)
    img_dir = os.path.join(data_dir, "images", split)
    caps: Dict[str, List[str]] = {}
    for a in payload["annotations"]:
        stem = f"{a['image_id']:012d}"
        path = os.path.join(img_dir, stem + ".jpg")
        if not os.path.exists(path):
            path = os.path.join(img_dir, stem + ".png")
        caps.setdefault(path, []).append(a["caption"])
    return caps


# -- resize / crop helpers (semantic.py:698-800 semantics) -----------------

def _box_prefilter(img, target: int):
    while min(img.size) >= 2 * target:
        img = img.resize(tuple(x // 2 for x in img.size), resample=Image.BOX)
    return img


def resize_group(imgs: Sequence, resamples: Sequence, size: int,
                 keep_aspect: bool = False) -> List[np.ndarray]:
    """Resize a group of aligned PIL images; the first drives geometry."""
    lead = _box_prefilter(imgs[0], size)
    if keep_aspect:
        scale = size / min(lead.size)
        target = tuple(round(x * scale) for x in lead.size)
    else:
        target = (size, size)
    return [np.array(im.resize(target, resample=rs))
            for im, rs in zip(imgs, resamples)]


def resize_pair(img, label, size: int, keep_aspect: bool = False):
    return tuple(resize_group([img, label], [Image.BICUBIC, Image.NEAREST],
                              size, keep_aspect=keep_aspect))


def _crop_group(imgs, resamples, smaller: int):
    """Shared scale-then-crop body: scale so min side = ``smaller`` (lead
    image BOX-prefiltered first, as the pair helpers always did), return
    arrays pre-crop."""
    lead = _box_prefilter(imgs[0], smaller)
    scale = smaller / min(lead.size)
    target = tuple(round(x * scale) for x in lead.size)
    return [np.array(im.resize(target, resample=rs))
            for im, rs in zip(imgs, resamples)]


def center_crop_group(imgs: Sequence, resamples: Sequence,
                      size: int) -> List[np.ndarray]:
    arrs = _crop_group(imgs, resamples, size)
    cy = (arrs[0].shape[0] - size) // 2
    cx = (arrs[0].shape[1] - size) // 2
    return [a[cy:cy + size, cx:cx + size] for a in arrs]


def center_crop_pair(img, label, size: int):
    return tuple(center_crop_group([img, label],
                                   [Image.BICUBIC, Image.NEAREST], size))


def random_crop_group(imgs: Sequence, resamples: Sequence, size: int,
                      rng: random.Random, min_crop_frac: float = 0.8,
                      max_crop_frac: float = 1.0) -> List[np.ndarray]:
    lo = math.ceil(size / max_crop_frac)
    hi = math.ceil(size / min_crop_frac)
    smaller = rng.randrange(lo, hi + 1)
    arrs = _crop_group(imgs, resamples, smaller)
    cy = rng.randrange(arrs[0].shape[0] - size + 1)
    cx = rng.randrange(arrs[0].shape[1] - size + 1)
    return [a[cy:cy + size, cx:cx + size] for a in arrs]


def random_crop_pair(img, label, size: int, rng: random.Random,
                     min_crop_frac: float = 0.8, max_crop_frac: float = 1.0):
    return tuple(random_crop_group(
        [img, label], [Image.BICUBIC, Image.NEAREST], size, rng,
        min_crop_frac=min_crop_frac, max_crop_frac=max_crop_frac))


def sample_rng(seed: int, idx: int, salt: int) -> random.Random:
    """The per-sample augmentation RNG — THE determinism contract shared by
    every dataset in this package.

    Augmentations depend only on (seed, salt, idx), so loads are
    reproducible across runs and worker counts (the threaded loader calls
    __getitem__ concurrently; a shared Random would interleave draws
    nondeterministically).  ``salt`` is the epoch in the parallel loader,
    so augmentations still vary across epochs — the reference's
    worker_init_fn contract (`main.py:156-183`).  Mixed with odd constants
    (splitmix-style) so nearby (idx, salt) pairs don't correlate.
    """
    mixed = (seed * 0x9E3779B1 + salt) * 0x85EBCA77 + idx
    return random.Random(mixed & 0xFFFFFFFFFFFFFFFF)


def choose_caption(caps: List[str], rng: random.Random,
                   is_train: bool) -> str:
    """Training samples draw one of the COCO captions; eval takes the
    first (reference `semantic.py:505-508`)."""
    return rng.choice(caps) if (is_train and len(caps) > 1) else caps[0]


class SemanticDataset:
    """Image + label-map dataset emitting FG-DM training dicts."""

    def __init__(
        self,
        dataset_mode: str,
        image_size: int,
        image_files: Sequence[str],
        class_files: Sequence[str],
        captions: Optional[Dict[str, List[str]]] = None,
        random_crop: bool = True,
        random_flip: bool = True,
        is_train: bool = True,
        use_rgb: bool = False,
        use_ade_colormap: bool = False,
        max_class_allowed: int = -1,
        seed: int = 0,
    ):
        assert len(image_files) == len(class_files), "image/label count mismatch"
        self.mode = dataset_mode
        self.size = image_size
        self.images = list(image_files)
        self.classes = list(class_files)
        self.captions = captions or {}
        self.random_crop = random_crop
        self.random_flip = random_flip
        self.is_train = is_train
        self.use_rgb = use_rgb
        self.use_ade_colormap = use_ade_colormap
        self.max_class_allowed = max_class_allowed
        self.seed = seed

    def __len__(self) -> int:
        return len(self.images)

    def _sample_rng(self, idx: int, salt: int) -> random.Random:
        return sample_rng(self.seed, idx, salt)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.sample(idx)

    def sample(self, idx: int, salt: int = 0) -> Dict[str, Any]:
        rng = self._sample_rng(idx, salt)
        path = self.images[idx]
        img = Image.open(path).convert("RGB")
        label_img = Image.open(self.classes[idx])
        label_img = label_img.convert("RGB" if self.mode == "sample" else "L")

        if self.mode == "cityscapes":
            ai, al = resize_pair(img, label_img, self.size, keep_aspect=True)
        elif self.is_train and self.random_crop:
            ai, al = random_crop_pair(img, label_img, self.size, rng)
        else:
            ai, al = resize_pair(img, label_img, self.size, keep_aspect=False)

        if self.random_flip and rng.random() < 0.5:
            ai = ai[:, ::-1].copy()
            al = al[:, ::-1].copy()

        rgb = ai.astype(np.float32) / 127.5 - 1.0

        out: Dict[str, Any] = {"path": path, "label_ori": al.copy()}
        al = al.astype(np.int64)
        if self.mode == "ade20k":
            al = al - 1
        parts = al.copy()
        if self.mode == "ade20k":
            parts[parts == 255] = 150
        if self.mode == "coco":
            parts[parts == 255] = 182
        out["parts"] = parts
        out["label"] = al

        if self.mode == "sample":
            seg_rgb = np.array(label_img)  # already-colorized input map
        elif self.use_ade_colormap:
            seg_rgb = colorize(coco_to_ade_labels(al), ade_cmap())
        else:
            n = max(int(al.max()) + 1, 1)
            seg_rgb = colorize(al, color_map(n))

        # FG-DM-Seg: the colorized seg map IS the training image
        out["image"] = seg_rgb.astype(np.float32) / 127.5 - 1.0
        if self.use_rgb:
            out["rgb"] = rgb

        caps = self.captions.get(path, [""])
        out["caption"] = choose_caption(caps, rng, self.is_train)
        return out


def load_data(
    dataset_mode: str,
    data_dir: str,
    image_size: int,
    random_crop: bool = True,
    random_flip: bool = True,
    is_train: bool = True,
    **kwargs,
) -> SemanticDataset:
    """Dataset factory mirroring reference mode→directory conventions
    (semantic.py:86-193).  Mode ``pose`` adds the pose factor family
    (COCO-WholeBody keypoints → rendered Halpe-136 skeletons,
    `data/pose.py` — working replacement for the reference's dead
    `ldm/data/custom.py` path)."""
    if dataset_mode == "pose":
        from fgdm_tpu.data.pose import load_pose_data

        return load_pose_data(
            data_dir, image_size, is_train=is_train,
            random_crop=random_crop, random_flip=random_flip, **kwargs)
    split_tv = "training" if is_train else "validation"
    if dataset_mode == "cityscapes":
        sub = "train" if is_train else "val"
        images = list_image_files(os.path.join(data_dir, "leftImg8bit", sub))
        labels = [
            f for f in list_image_files(os.path.join(data_dir, "gtFine", sub))
            if f.endswith("_labelIds.png")
        ]
        captions = None
    elif dataset_mode == "ade20k":
        images = list_image_files(os.path.join(data_dir, "images", split_tv))
        labels = list_image_files(os.path.join(data_dir, "annotations", split_tv))
        captions = None
    elif dataset_mode == "celeba":
        images = list_image_files(os.path.join(data_dir, "images", split_tv))
        labels = list_image_files(os.path.join(data_dir, "annotations", split_tv))
        captions = None
    elif dataset_mode == "coco":
        split = "train2017" if is_train else "val2017"
        images = list_image_files(os.path.join(data_dir, "images", split))
        labels = list_image_files(os.path.join(data_dir, "annotations", split))
        captions = load_coco_captions(data_dir, is_train)
    elif dataset_mode == "sample":
        images = list_image_files(os.path.join(data_dir, "sample1"))
        labels = list_image_files(os.path.join(data_dir, "sample2"))
        captions = None
    else:
        raise NotImplementedError(dataset_mode)
    return SemanticDataset(
        dataset_mode, image_size, images, labels, captions=captions,
        random_crop=random_crop, random_flip=random_flip, is_train=is_train,
        **kwargs,
    )


def batch_iterator(
    dataset: SemanticDataset,
    batch_size: int,
    tokenizer=None,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    epochs: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """NHWC numpy batches with tokenized captions — feed to shard_batch."""
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        for start in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                           batch_size):
            idxs = order[start:start + batch_size]
            if len(idxs) < batch_size and drop_last:
                break
            items = [dataset[int(i)] for i in idxs]
            batch: Dict[str, np.ndarray] = {
                "image": np.stack([it["image"] for it in items]).astype(np.float32),
                "parts": np.stack([it["parts"] for it in items]),
            }
            if "rgb" in items[0]:
                batch["rgb"] = np.stack([it["rgb"] for it in items]).astype(np.float32)
            captions = [it["caption"] for it in items]
            if tokenizer is not None:
                batch["input_ids"] = tokenizer(captions)
            batch["captions"] = captions
            yield batch
        epoch += 1
