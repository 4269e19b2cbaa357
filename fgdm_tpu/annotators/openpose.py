"""OpenPose body-pose annotator (CPM two-branch network + PAF grouping).

Mirrors `/root/reference/controlnet/annotator/openpose/`:
``bodypose_model`` (`model.py:24-142`) — VGG-ish stem (conv1..conv4_4_CPM)
then 6 refinement stages, each with an L1 branch (38-ch part-affinity
fields) and an L2 branch (19-ch keypoint heatmaps), stages consuming
``concat(L1, L2, features)``; and the detection flow (`body.py`) — heatmap
peak extraction and PAF-scored limb assembly, rendered as the colored
skeleton image ControlNet conditions on.

The network runs jitted; peak finding + grouping is host-side numpy (as in
the reference).  The limb pairing here uses the canonical COCO-18 limb/PAF
tables with integral PAF scoring — a compact re-derivation of the
reference's candidate-connection logic.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fgdm_tpu.nn.layers import Conv2d

Dtype = Any

# COCO-18 limb sequence and the PAF channel pairs (public OpenPose tables)
LIMB_SEQ = [
    (2, 3), (2, 6), (3, 4), (4, 5), (6, 7), (7, 8), (2, 9), (9, 10),
    (10, 11), (2, 12), (12, 13), (13, 14), (2, 1), (1, 15), (15, 17),
    (1, 16), (16, 18), (3, 17), (6, 18),
]
MAP_IDX = [
    (31, 32), (39, 40), (33, 34), (35, 36), (41, 42), (43, 44), (19, 20),
    (21, 22), (23, 24), (25, 26), (27, 28), (29, 30), (47, 48), (49, 50),
    (53, 54), (51, 52), (55, 56), (37, 38), (45, 46),
]
COLORS = [
    [255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0], [170, 255, 0],
    [85, 255, 0], [0, 255, 0], [0, 255, 85], [0, 255, 170], [0, 255, 255],
    [0, 170, 255], [0, 85, 255], [0, 0, 255], [85, 0, 255], [170, 0, 255],
    [255, 0, 255], [255, 0, 170], [255, 0, 85],
]


class ConvStage(nn.Module):
    """A named sequence of convs with ReLU between (final conv bare)."""

    plan: Sequence[Tuple[str, int, int]]   # (name, out_ch, kernel)
    pools_after: Sequence[str] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.plan)
        for i, (name, ch, k) in enumerate(self.plan):
            x = Conv2d(ch, kernel_size=k, padding=k // 2, dtype=self.dtype,
                       name=name)(x)
            if i < n - 1:
                x = jax.nn.relu(x)
            if name in self.pools_after:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class BodyPoseNet(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B,H,W,3] (normalized) → (paf [B,H/8,W/8,38],
        heat [B,H/8,W/8,19])."""
        stem_plan = [
            ("conv1_1", 64, 3), ("conv1_2", 64, 3),
            ("conv2_1", 128, 3), ("conv2_2", 128, 3),
            ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
            ("conv3_4", 256, 3),
            ("conv4_1", 512, 3), ("conv4_2", 512, 3),
            ("conv4_3_CPM", 256, 3), ("conv4_4_CPM", 128, 3),
        ]
        h = x
        for i, (name, ch, k) in enumerate(stem_plan):
            h = Conv2d(ch, kernel_size=k, padding=k // 2, dtype=self.dtype,
                       name=name)(h)
            h = jax.nn.relu(h)
            if name in ("conv1_2", "conv2_2", "conv3_4"):
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        feat = h

        def branch(inp, stage, L, out_ch):
            if stage == 1:
                plan = [(f"conv5_{j}_CPM_L{L}", 128, 3) for j in (1, 2, 3)]
                plan += [(f"conv5_4_CPM_L{L}", 512, 1),
                         (f"conv5_5_CPM_L{L}", out_ch, 1)]
            else:
                plan = [(f"Mconv{j}_stage{stage}_L{L}", 128, 7)
                        for j in range(1, 6)]
                plan += [(f"Mconv6_stage{stage}_L{L}", 128, 1),
                         (f"Mconv7_stage{stage}_L{L}", out_ch, 1)]
            return ConvStage(plan, dtype=self.dtype,
                             name=f"stage{stage}_L{L}")(inp)

        paf = branch(feat, 1, 1, 38)
        heat = branch(feat, 1, 2, 19)
        for s in range(2, 7):
            inp = jnp.concatenate([paf, heat, feat], axis=-1)
            paf = branch(inp, s, 1, 38)
            heat = branch(inp, s, 2, 19)
        # reference quirk: its no_relu_layers lists Mconv7_stage6_L1 twice
        # and never Mconv7_stage6_L2, so the FINAL heat conv is relu'ed
        # (model.py:30-33) — reproduced for checkpoint parity
        return paf, jax.nn.relu(heat)


def find_peaks(heat: np.ndarray, thre1: float = 0.1) -> List[List[Tuple]]:
    """Per-channel local maxima (y, x, score, id) — body.py peak pass."""
    from scipy.ndimage import gaussian_filter, maximum_filter

    all_peaks = []
    pid = 0
    for c in range(18):
        m = gaussian_filter(heat[..., c], sigma=3)
        mx = maximum_filter(m, size=3, mode="constant")
        peaks = np.argwhere((m == mx) & (m > thre1))
        lst = []
        for y, x in peaks:
            lst.append((x, y, heat[y, x, c], pid))
            pid += 1
        all_peaks.append(lst)
    return all_peaks


def score_limbs(paf: np.ndarray, all_peaks, thre2: float = 0.05,
                n_sample: int = 10):
    """PAF line-integral scoring of candidate limbs (body.py connection
    pass, compacted)."""
    connections = []
    for limb_i, ((a, b), (m1, m2)) in enumerate(zip(LIMB_SEQ, MAP_IDX)):
        candA = all_peaks[a - 1]
        candB = all_peaks[b - 1]
        pafx = paf[..., m1 - 19]
        pafy = paf[..., m2 - 19]
        conns = []
        for ia, pa in enumerate(candA):
            for ib, pb in enumerate(candB):
                vec = np.asarray([pb[0] - pa[0], pb[1] - pa[1]], np.float32)
                norm = np.linalg.norm(vec) + 1e-8
                vecn = vec / norm
                xs = np.linspace(pa[0], pb[0], n_sample).astype(int)
                ys = np.linspace(pa[1], pb[1], n_sample).astype(int)
                score = (pafx[ys, xs] * vecn[0] + pafy[ys, xs] * vecn[1])
                mean_s = score.mean() + min(0.5 * paf.shape[0] / norm - 1, 0)
                if (score > thre2).sum() > 0.8 * n_sample and mean_s > 0:
                    conns.append((ia, ib, mean_s))
        conns.sort(key=lambda t: -t[2])
        used_a, used_b, kept = set(), set(), []
        for ia, ib, s in conns:
            if ia not in used_a and ib not in used_b:
                kept.append((ia, ib, s))
                used_a.add(ia)
                used_b.add(ib)
        connections.append(kept)
    return connections


def draw_bodypose(canvas: np.ndarray, all_peaks, connections) -> np.ndarray:
    import cv2

    for limb_i, ((a, b), kept) in enumerate(zip(LIMB_SEQ, connections)):
        color = COLORS[limb_i % len(COLORS)]
        for ia, ib, _ in kept:
            pa = all_peaks[a - 1][ia]
            pb = all_peaks[b - 1][ib]
            cv2.line(canvas, (int(pa[0]), int(pa[1])),
                     (int(pb[0]), int(pb[1])), color, 4)
    for c, peaks in enumerate(all_peaks):
        for x, y, s, _ in peaks:
            cv2.circle(canvas, (int(x), int(y)), 4,
                       COLORS[c % len(COLORS)], thickness=-1)
    return canvas


class OpenposeDetector:
    """uint8 HWC image → skeleton render (reference contract,
    openpose/__init__.py:21)."""

    def __init__(self, params, model: BodyPoseNet | None = None):
        self.model = model or BodyPoseNet()
        self.params = params
        self._jit = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        x = img.astype(np.float32) / 256.0 - 0.5  # reference normalization
        paf, heat = self._jit(self.params, x[None])
        paf = np.asarray(
            jax.image.resize(paf, (1, h, w, 38), "bicubic"))[0]
        heat = np.asarray(
            jax.image.resize(heat, (1, h, w, 19), "bicubic"))[0]
        peaks = find_peaks(heat)
        conns = score_limbs(paf, peaks)
        canvas = np.zeros((h, w, 3), np.uint8)
        return draw_bodypose(canvas, peaks, conns)


def load_openpose(ckpt_path: str, dtype=jnp.float32) -> OpenposeDetector:
    """Strict loader: body_pose torch checkpoint → OpenposeDetector.
    Raises on any missing/unexpected key (schema
    `/root/reference/controlnet/annotator/openpose/model.py:24-142`)."""
    from fgdm_tpu.checkpoint.annotator_ingest import ingest_openpose
    from fgdm_tpu.checkpoint.torch_ingest import load_torch_state_dict

    model = BodyPoseNet(dtype=dtype)
    expect = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    params, missing, unexpected = ingest_openpose(
        load_torch_state_dict(ckpt_path), expect=expect)
    if missing or unexpected:
        raise ValueError(
            f"OpenPose ingest from {ckpt_path}: {len(missing)} missing "
            f"(e.g. {missing[:3]}), {len(unexpected)} unexpected "
            f"(e.g. {unexpected[:3]})")
    return OpenposeDetector(jax.tree.map(jnp.asarray, params), model)
