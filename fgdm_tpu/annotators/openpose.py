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


def draw_bodypose(canvas: np.ndarray, persons) -> np.ndarray:
    """Render the assembled (and person-filtered) skeletons — the analog of
    `openpose/util.py:draw_bodypose`, which draws from the filtered subset
    matrix (17 limbs + 18 joint channels), so spurious peak chains the
    person filter discards never reach the control map."""
    import cv2

    for limb_i, (a, b) in enumerate(LIMB_SEQ[:17]):
        color = COLORS[limb_i % len(COLORS)]
        for person in persons:
            pa = person.get(a - 1)
            pb = person.get(b - 1)
            if pa is None or pb is None:
                continue
            cv2.line(canvas, (int(pa[0]), int(pa[1])),
                     (int(pb[0]), int(pb[1])), color, 4)
    for person in persons:
        for c, (x, y, s, _) in person.items():
            cv2.circle(canvas, (int(x), int(y)), 4,
                       COLORS[c % len(COLORS)], thickness=-1)
    return canvas


class HandPoseNet(nn.Module):
    """CPM hand-keypoint network (`openpose/model.py:143-216`,
    ``handpose_model``): VGG stem conv1_1..conv5_3_CPM (pools after
    conv1_2/conv2_2/conv3_4), a 22-channel stage-1 head
    (conv6_1_CPM→conv6_2_CPM), then 5 refinement stages consuming
    ``concat(prev_out, features)`` through Mconv1..Mconv7.  Only
    conv6_2_CPM and the Mconv7s skip ReLU (`:148-149` — unlike the body
    net, the final stage-6 head is correctly listed)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B,H,W,3] (normalized) → heat [B,H/8,W/8,22]."""
        stem_plan = [
            ("conv1_1", 64, 3), ("conv1_2", 64, 3),
            ("conv2_1", 128, 3), ("conv2_2", 128, 3),
            ("conv3_1", 256, 3), ("conv3_2", 256, 3), ("conv3_3", 256, 3),
            ("conv3_4", 256, 3),
            ("conv4_1", 512, 3), ("conv4_2", 512, 3), ("conv4_3", 512, 3),
            ("conv4_4", 512, 3),
            ("conv5_1", 512, 3), ("conv5_2", 512, 3),
            ("conv5_3_CPM", 128, 3),
        ]
        h = x
        for name, ch, k in stem_plan:
            h = Conv2d(ch, kernel_size=k, padding=k // 2, dtype=self.dtype,
                       name=name)(h)
            h = jax.nn.relu(h)
            if name in ("conv1_2", "conv2_2", "conv3_4"):
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        feat = h

        out = Conv2d(512, kernel_size=1, padding=0, dtype=self.dtype,
                     name="conv6_1_CPM")(feat)
        out = Conv2d(22, kernel_size=1, padding=0, dtype=self.dtype,
                     name="conv6_2_CPM")(jax.nn.relu(out))
        for s in range(2, 7):
            plan = [(f"Mconv{j}_stage{s}", 128, 7) for j in range(1, 6)]
            plan += [(f"Mconv6_stage{s}", 128, 1), (f"Mconv7_stage{s}", 22, 1)]
            out = ConvStage(plan, dtype=self.dtype, name=f"stage{s}")(
                jnp.concatenate([out, feat], axis=-1))
        return out


def assemble_persons(all_peaks, connections, min_parts: int = 4,
                     min_score: float = 0.4) -> List[Dict[int, Tuple]]:
    """Group peaks into persons by union-find over the kept limb
    connections — the compact analog of the reference's subset matrix
    (`body.py` person assembly), producing {part_channel: (x, y, score,
    id)} per person so hand_detect can read shoulder/elbow/wrist.

    Applies the reference's person filter (`body.py:200-205`): a person is
    dropped when it has fewer than ``min_parts`` parts or its total score
    (part scores + connection scores, the subset row's ``-2`` column)
    averaged over parts falls below ``min_score`` — spurious short peak
    chains never reach the render or the hand detector."""
    parent: Dict[int, int] = {}

    def find(i):
        while parent.setdefault(i, i) != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        parent[find(i)] = find(j)

    peak_of = {}
    part_of = {}
    for c, peaks in enumerate(all_peaks):
        for p in peaks:
            peak_of[p[3]] = p
            part_of[p[3]] = c
    conn_scores: List[Tuple[int, float]] = []
    for (a, b), kept in zip(LIMB_SEQ, connections):
        for ia, ib, s in kept:
            pid_a = all_peaks[a - 1][ia][3]
            union(pid_a, all_peaks[b - 1][ib][3])
            conn_scores.append((pid_a, float(s)))
    groups: Dict[int, Dict[int, Tuple]] = {}
    score: Dict[int, float] = {}
    for pid, p in peak_of.items():
        root = find(pid)
        groups.setdefault(root, {})[part_of[pid]] = p
        score[root] = score.get(root, 0.0) + float(p[2])
    for pid, s in conn_scores:
        score[find(pid)] += s
    return [g for root, g in groups.items()
            if len(g) >= min_parts and score[root] / len(g) >= min_score]


def hand_detect(persons, image_height: int, image_width: int,
                ratio_wrist_elbow: float = 0.33) -> List[Tuple]:
    """Port of `openpose/util.py:94-160` ``handDetect``: square crop boxes
    from shoulder/elbow/wrist geometry (part channels — right 2/3/4, left
    5/6/7; box extends the forearm past the wrist by the 0.33 OpenPose
    ratio, width 1.5·max(wrist-elbow, 0.9·elbow-shoulder), clamped to the
    image, dropped under 20 px).  Returns [(x, y, w, is_left)]."""
    import math

    out = []
    for person in persons:
        hands = []
        if all(k in person for k in (5, 6, 7)):
            hands.append((person[5], person[6], person[7], True))
        if all(k in person for k in (2, 3, 4)):
            hands.append((person[2], person[3], person[4], False))
        for shoulder, elbow, wrist, is_left in hands:
            x1, y1 = float(shoulder[0]), float(shoulder[1])
            x2, y2 = float(elbow[0]), float(elbow[1])
            x3, y3 = float(wrist[0]), float(wrist[1])
            x = x3 + ratio_wrist_elbow * (x3 - x2)
            y = y3 + ratio_wrist_elbow * (y3 - y2)
            d_we = math.sqrt((x3 - x2) ** 2 + (y3 - y2) ** 2)
            d_es = math.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
            width = 1.5 * max(d_we, 0.9 * d_es)
            x -= width / 2
            y -= width / 2
            x, y = max(x, 0.0), max(y, 0.0)
            width1 = width2 = width
            if x + width > image_width:
                width1 = image_width - x
            if y + width > image_height:
                width2 = image_height - y
            width = min(width1, width2)
            if width >= 20:
                out.append((int(x), int(y), int(width), is_left))
    return out


HAND_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8),
    (0, 9), (9, 10), (10, 11), (11, 12), (0, 13), (13, 14), (14, 15),
    (15, 16), (0, 17), (17, 18), (18, 19), (19, 20),
]


def draw_handpose(canvas: np.ndarray, all_hand_peaks) -> np.ndarray:
    """`util.py:74-90`: HSV-rainbow finger edges + red joint dots; an edge
    is drawn only when both endpoints were detected (nonzero)."""
    import cv2
    from matplotlib.colors import hsv_to_rgb

    for peaks in all_hand_peaks:
        for ie, e in enumerate(HAND_EDGES):
            if np.all(peaks[list(e)] != 0):
                x1, y1 = peaks[e[0]]
                x2, y2 = peaks[e[1]]
                color = hsv_to_rgb(
                    [ie / float(len(HAND_EDGES)), 1.0, 1.0]) * 255
                cv2.line(canvas, (int(x1), int(y1)), (int(x2), int(y2)),
                         color.tolist(), thickness=2)
        for x, y in peaks:
            cv2.circle(canvas, (int(x), int(y)), 4, (0, 0, 255),
                       thickness=-1)
    return canvas


class HandEstimator:
    """Host-side hand keypoint estimator (`openpose/hand.py:25-76`):
    4-scale test-time augmentation around boxsize 368, TF-style pad to the
    8-px stride (value 128), averaged cubic-upsampled heatmaps, then per-
    part peak extraction — gaussian blur σ3, 0.05 threshold, 8-connected
    component with max mass, argmax → (x, y); undetected parts are
    (0, 0)."""

    def __init__(self, params, model: HandPoseNet | None = None):
        self.model = model or HandPoseNet()
        self.params = params
        self._jit = jax.jit(lambda p, x: self.model.apply(p, x))

    def __call__(self, ori_img: np.ndarray, thre: float = 0.05,
                 boxsize: int = 368) -> np.ndarray:
        import cv2
        from scipy.ndimage import gaussian_filter
        from scipy.ndimage import label as cc_label

        h, w = ori_img.shape[:2]
        stride, pad_value = 8, 128
        heat_avg = np.zeros((h, w, 22), np.float32)
        scales = [s * boxsize / h for s in (0.5, 1.0, 1.5, 2.0)]
        for scale in scales:
            img = cv2.resize(ori_img, (0, 0), fx=scale, fy=scale,
                             interpolation=cv2.INTER_CUBIC)
            pad_d = (stride - img.shape[0] % stride) % stride
            pad_r = (stride - img.shape[1] % stride) % stride
            img_p = np.pad(img, ((0, pad_d), (0, pad_r), (0, 0)),
                           constant_values=pad_value)
            x = img_p.astype(np.float32) / 256.0 - 0.5
            heat = np.asarray(self._jit(self.params, x[None]))[0]
            heat = cv2.resize(heat, (0, 0), fx=stride, fy=stride,
                              interpolation=cv2.INTER_CUBIC)
            heat = heat[:img_p.shape[0] - pad_d, :img_p.shape[1] - pad_r]
            heat = cv2.resize(heat, (w, h), interpolation=cv2.INTER_CUBIC)
            heat_avg += heat / len(scales)

        peaks = []
        eight = np.ones((3, 3), np.int32)  # 8-connectivity (skimage parity)
        for part in range(21):
            m = heat_avg[..., part].copy()
            blurred = gaussian_filter(m, sigma=3)
            binary = blurred > thre
            if not binary.any():
                peaks.append([0, 0])
                continue
            lab, n = cc_label(binary, structure=eight)
            sums = [m[lab == i].sum() for i in range(1, n + 1)]
            m[lab != (int(np.argmax(sums)) + 1)] = 0
            yy, xx = np.unravel_index(np.argmax(m), m.shape)
            peaks.append([int(xx), int(yy)])
        return np.array(peaks)


class OpenposeDetector:
    """uint8 HWC image → skeleton render (reference contract,
    openpose/__init__.py:21-48).  ``hand=True`` (reference default off)
    additionally runs ``handDetect`` crops through the hand CPM and draws
    the 21-keypoint hand skeletons."""

    def __init__(self, params, model: BodyPoseNet | None = None,
                 hand_params=None, hand_model: HandPoseNet | None = None):
        self.model = model or BodyPoseNet()
        self.params = params
        self._jit = jax.jit(lambda p, x: self.model.apply(p, x))
        self.hand_estimation = (
            HandEstimator(hand_params, hand_model)
            if hand_params is not None else None)

    def __call__(self, img: np.ndarray, hand: bool = False) -> np.ndarray:
        h, w = img.shape[:2]
        x = img.astype(np.float32) / 256.0 - 0.5  # reference normalization
        paf, heat = self._jit(self.params, x[None])
        paf = np.asarray(
            jax.image.resize(paf, (1, h, w, 38), "bicubic"))[0]
        heat = np.asarray(
            jax.image.resize(heat, (1, h, w, 19), "bicubic"))[0]
        peaks = find_peaks(heat)
        conns = score_limbs(paf, peaks)
        persons = assemble_persons(peaks, conns)
        canvas = np.zeros((h, w, 3), np.uint8)
        canvas = draw_bodypose(canvas, persons)
        if hand:
            if self.hand_estimation is None:
                raise ValueError(
                    "hand=True needs hand weights — load via "
                    "load_openpose(..., hand_ckpt_path=...)")
            all_hand_peaks = []
            for hx, hy, hw_, is_left in hand_detect(persons, h, w):
                hp = self.hand_estimation(img[hy:hy + hw_, hx:hx + hw_])
                # offset detected (nonzero) peaks into image coords
                hp[:, 0] = np.where(hp[:, 0] == 0, 0, hp[:, 0] + hx)
                hp[:, 1] = np.where(hp[:, 1] == 0, 0, hp[:, 1] + hy)
                all_hand_peaks.append(hp)
            canvas = draw_handpose(canvas, all_hand_peaks)
        return canvas


def load_openpose(ckpt_path: str, hand_ckpt_path: str | None = None,
                  dtype=jnp.float32) -> OpenposeDetector:
    """Strict loader: body_pose (+ optional hand_pose) torch checkpoints →
    OpenposeDetector.  Raises on any missing/unexpected key (schemas
    `/root/reference/controlnet/annotator/openpose/model.py:24-216`)."""
    from fgdm_tpu.checkpoint.annotator_ingest import (
        ingest_handpose,
        ingest_openpose,
    )
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
    hand_params = hand_model = None
    if hand_ckpt_path is not None:
        hand_model = HandPoseNet(dtype=dtype)
        hexp = jax.eval_shape(lambda: hand_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
        hand_params, missing, unexpected = ingest_handpose(
            load_torch_state_dict(hand_ckpt_path), expect=hexp)
        if missing or unexpected:
            raise ValueError(
                f"OpenPose hand ingest from {hand_ckpt_path}: "
                f"{len(missing)} missing (e.g. {missing[:3]}), "
                f"{len(unexpected)} unexpected (e.g. {unexpected[:3]})")
        hand_params = jax.tree.map(jnp.asarray, hand_params)
    return OpenposeDetector(jax.tree.map(jnp.asarray, params), model,
                            hand_params=hand_params, hand_model=hand_model)
