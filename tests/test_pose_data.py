"""Pose-factor dataset: Halpe-136 assembly, skeleton render, pipeline.

The reference's pose dataset is dead code (`ldm/data/custom.py:15` imports
a module that does not exist); these tests pin the working equivalent
(`fgdm_tpu/data/pose.py`) against the reference's documented behaviour
(`halpe_coco_wholebody_136.py:93-614`).
"""

import json
import os

import numpy as np
import pytest

from fgdm_tpu.data import pose as P

cv2 = pytest.importorskip("cv2")
PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _person(cx=40.0, cy=40.0, conf=2.0, with_wholebody=False):
    """A synthetic standing person: COCO-17 body in a 80×80 box."""
    body = {
        0: (cx, cy - 30), 1: (cx - 3, cy - 33), 2: (cx + 3, cy - 33),
        3: (cx - 6, cy - 31), 4: (cx + 6, cy - 31),
        5: (cx - 10, cy - 20), 6: (cx + 10, cy - 20),
        7: (cx - 14, cy - 8), 8: (cx + 14, cy - 8),
        9: (cx - 15, cy + 2), 10: (cx + 15, cy + 2),
        11: (cx - 6, cy + 5), 12: (cx + 6, cy + 5),
        13: (cx - 7, cy + 18), 14: (cx + 7, cy + 18),
        15: (cx - 7, cy + 30), 16: (cx + 7, cy + 30),
    }
    kp = []
    for i in range(17):
        x, y = body[i]
        kp += [float(x), float(y), conf]
    ann = {"keypoints": kp, "num_keypoints": 17, "image_id": 1, "iscrowd": 0}
    if with_wholebody:
        ann["foot_kpts"] = [float(cx), float(cy + 32), 1.0] * 6
        ann["face_kpts"] = [float(cx), float(cy - 32), 1.0] * 68
        ann["lefthand_kpts"] = [float(cx - 16), float(cy + 3), 1.0] * 21
        ann["righthand_kpts"] = [float(cx + 16), float(cy + 3), 1.0] * 21
    return ann


def test_vis_pairs_matches_reference_table():
    # spot-pin the table against the reference listing
    # (halpe_coco_wholebody_136.py:122-138): section boundaries + count
    assert P.VIS_PAIRS[:4] == [(0, 1), (0, 2), (1, 3), (2, 4)]
    assert (5, 18) in P.VIS_PAIRS and (19, 12) in P.VIS_PAIRS
    assert (15, 22) in P.VIS_PAIRS and (16, 25) in P.VIS_PAIRS
    assert (26, 27) in P.VIS_PAIRS and (92, 93) in P.VIS_PAIRS
    assert (94, 99) in P.VIS_PAIRS and (115, 132) in P.VIS_PAIRS
    # 4 head + 14 body + 6 feet + 60 face + 20 + 20 hands
    assert len(P.VIS_PAIRS) == 124
    # every index in range
    assert max(max(p) for p in P.VIS_PAIRS) == 135


def test_assemble_halpe136_body_only():
    kpts = P.assemble_halpe136(_person())
    assert kpts.shape == (136, 3)
    # neck (18) = shoulder midpoint, hip (19) = hip midpoint
    np.testing.assert_allclose(kpts[18, :2], (kpts[5, :2] + kpts[6, :2]) / 2)
    np.testing.assert_allclose(kpts[19, :2], (kpts[11, :2] + kpts[12, :2]) / 2)
    # wholebody slots absent → origin-pinned (renderer skips them)
    assert not kpts[26:94, :2].any()


def test_assemble_halpe136_wholebody_slots():
    kpts = P.assemble_halpe136(_person(with_wholebody=True))
    assert kpts[20:26, :2].any()      # feet
    assert kpts[26:94, :2].any()      # face
    assert kpts[94:115, :2].any()     # left hand
    assert kpts[115:136, :2].any()    # right hand


def test_assemble_rejects_crowd_and_empty():
    assert P.assemble_halpe136({"iscrowd": 1, "keypoints": [1.0] * 51}) is None
    assert P.assemble_halpe136({"keypoints": [0.0] * 51}) is None
    assert P.assemble_halpe136(
        {"keypoints": [1.0] * 51, "num_keypoints": 0}) is None


def test_render_skeleton_draws_colored_limbs():
    kpts = P.assemble_halpe136(_person())
    canvas = P.render_skeleton([kpts], 80, 80)
    assert canvas.shape == (80, 80, 3) and canvas.dtype == np.uint8
    assert canvas.any(), "skeleton must draw something"
    # background stays black away from the figure
    assert not canvas[:2].any() and not canvas[:, :2].any()
    # more than one limb colour present (palette encodes limb identity)
    colors = {tuple(c) for c in canvas.reshape(-1, 3) if c.any()}
    assert len(colors) > 3


def test_render_skips_origin_joints():
    kpts = np.zeros((136, 3), np.float32)
    kpts[0] = (10, 10, 1)  # joint 1..4 at origin → no head edges drawn
    canvas = P.render_skeleton([kpts], 32, 32)
    assert not canvas.any()


@pytest.fixture()
def pose_tree(tmp_path):
    """COCO-layout tree: images/, annotations/ labels + keypoints JSON."""
    img_dir = tmp_path / "images" / "train2017"
    ann_dir = tmp_path / "annotations" / "train2017"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        ).save(img_dir / f"{i:012d}.jpg")
        Image.fromarray(
            rng.integers(0, 5, (96, 128), dtype=np.uint8)
        ).save(tmp_path / "annotations" / "train2017" / f"{i:012d}.png")
    payload = {
        "images": [{"id": i, "file_name": f"{i:012d}.jpg",
                    "width": 128, "height": 96} for i in range(3)],
        "annotations": [
            dict(_person(cx=60, cy=48), image_id=0, id=100),
            dict(_person(cx=30, cy=48), image_id=1, id=101),
            dict(_person(cx=90, cy=48), image_id=1, id=102),
            # image 2: nobody → blank skeleton
        ],
    }
    kp_file = tmp_path / "annotations" / "person_keypoints_train2017.json"
    kp_file.write_text(json.dumps(payload))
    caps = {"annotations": [
        {"image_id": i, "caption": f"caption {i}"} for i in range(3)]}
    (tmp_path / "annotations" / "captions_train2017.json").write_text(
        json.dumps(caps))
    return tmp_path


def test_load_pose_data_end_to_end(pose_tree):
    ds = P.load_pose_data(str(pose_tree), image_size=64)
    assert len(ds) == 3
    item = ds[0]
    assert item["pose"].shape == (64, 64, 3)
    assert item["image"].shape == (64, 64, 9)  # [rgb | seg | pose]
    assert item["pose"].min() >= -1.0 and item["pose"].max() <= 1.0
    assert item["pose"].max() > -1.0, "skeleton visible after crop/resize"
    assert item["caption"] == "caption 0"
    # two people on image 1
    assert len(ds.keypoints[ds.images[1]]) == 2
    # image 2 has no people: blank pose, training sample still valid
    item2 = ds[2]
    assert np.allclose(item2["pose"], -1.0)
    assert item2["image"].shape == (64, 64, 9)


def test_pose_only_mode_and_determinism(pose_tree):
    ds = P.load_pose_data(str(pose_tree), image_size=64, pose_only=True,
                          seed=7)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    np.testing.assert_array_equal(item["image"], item["pose"])
    # per-sample RNG: same (idx, salt) → identical augmentation; different
    # salt (epoch) → different crop with overwhelming probability
    a = ds.sample(0, salt=3)
    b = ds.sample(0, salt=3)
    np.testing.assert_array_equal(a["image"], b["image"])
    c = ds.sample(0, salt=4)
    assert not np.array_equal(a["image"], c["image"])


def test_load_data_pose_mode(pose_tree):
    """The config-system dataset factory routes mode 'pose' here, so
    reference-style YAMLs reach the pose family through
    `ldm.data.semantic.load_data` with dataset_mode: pose."""
    from fgdm_tpu.data.dataset import load_data

    ds = load_data("pose", str(pose_tree), image_size=32, pose_only=True)
    assert len(ds) == 3
    assert ds[0]["image"].shape == (32, 32, 3)


def test_batch_iterator_consumes_pose_dataset(pose_tree):
    from fgdm_tpu.data.dataset import batch_iterator

    ds = P.load_pose_data(str(pose_tree), image_size=32)
    batch = next(batch_iterator(ds, batch_size=2, shuffle=False, seed=0))
    assert batch["image"].shape == (2, 32, 32, 9)
    assert batch["parts"].shape == (2, 32, 32)
    assert len(batch["captions"]) == 2
