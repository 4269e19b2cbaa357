"""OpenPose + MLSD annotator tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.annotators.mlsd import (
    MLSDdetector,
    MobileV2MLSDLarge,
    decode_lines,
)
from fgdm_tpu.annotators.openpose import (
    LIMB_SEQ,
    MAP_IDX,
    BodyPoseNet,
    OpenposeDetector,
    find_peaks,
    score_limbs,
)


def test_mlsd_net_shapes():
    net = MobileV2MLSDLarge()
    x = jnp.zeros((1, 128, 128, 4))
    params = net.init(jax.random.PRNGKey(0), x)
    tp = net.apply(params, x)
    assert tp.shape == (1, 64, 64, 9)  # half-res 9-channel tpMap


def test_mlsd_decode_synthetic():
    """A synthetic center+displacement map decodes to the planted line."""
    tp = np.zeros((64, 64, 9), np.float32)
    tp[..., 0] = -10.0            # background logit
    tp[30, 30, 0] = 10.0          # one strong junction
    tp[30, 30, 1:5] = [-15, 0, 15, 0]  # horizontal line ±15 px
    lines = decode_lines(tp, score_thr=0.1, dist_thr=20.0)
    assert lines.shape == (1, 4)
    x0, y0, x1, y1 = lines[0]
    assert y0 == y1 == 60           # 2× grid
    assert x1 - x0 == 60


def test_mlsd_detector_end_to_end():
    net = MobileV2MLSDLarge()
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 128, 128, 4)))))
    det = MLSDdetector(params, net, input_size=128)
    img = np.zeros((96, 96, 3), np.uint8)
    out = det(img)
    assert out.shape == (96, 96) and out.dtype == np.uint8


def test_openpose_tables():
    assert len(LIMB_SEQ) == len(MAP_IDX) == 19


def test_bodypose_net_shapes():
    net = BodyPoseNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    paf, heat = net.apply(params, x)
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)


def test_peaks_and_limbs_synthetic():
    """Two planted keypoints joined by a consistent PAF produce one limb."""
    heat = np.zeros((64, 64, 19), np.float32)
    heat[17:24, 7:14, 1] = 1.0    # neck blob (part 2 → channel 1)
    heat[17:24, 47:54, 2] = 1.0   # r-shoulder blob (part 3 → channel 2)
    paf = np.zeros((64, 64, 38), np.float32)
    m1, m2 = MAP_IDX[0]
    paf[18:23, 10:51, m1 - 19] = 1.0   # unit x-direction field
    peaks = find_peaks(heat, thre1=0.05)
    assert len(peaks[1]) == 1 and len(peaks[2]) == 1
    conns = score_limbs(paf, peaks)
    assert len(conns[0]) == 1          # neck→shoulder limb found
    ia, ib, score = conns[0][0]
    assert score > 0.5


def test_openpose_detector_end_to_end():
    net = BodyPoseNet()
    params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0),
                                        jnp.zeros((1, 64, 64, 3)))))
    det = OpenposeDetector(params, net)
    img = np.zeros((64, 64, 3), np.uint8)
    out = det(img)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_handpose_net_shapes():
    from fgdm_tpu.annotators.openpose import HandPoseNet

    net = HandPoseNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    heat = net.apply(params, x)
    assert heat.shape == (1, 8, 8, 22)


def test_assemble_persons_groups_by_connection():
    from fgdm_tpu.annotators.openpose import assemble_persons

    # two persons, each a 4-part arm chain neck→shoulder→elbow→wrist
    # (channels 1-4 via limbs (2,3)/(3,4)/(4,5)) so both pass the
    # reference's ≥4-parts person filter
    all_peaks = [[] for _ in range(18)]
    all_peaks[1] = [(10, 10, 1.0, 0), (50, 10, 1.0, 1)]
    all_peaks[2] = [(12, 20, 1.0, 2), (52, 20, 1.0, 3)]
    all_peaks[3] = [(14, 30, 1.0, 4), (54, 30, 1.0, 5)]
    all_peaks[4] = [(16, 40, 1.0, 6), (56, 40, 1.0, 7)]
    conns = [[] for _ in range(19)]
    conns[0] = [(0, 0, 1.0), (1, 1, 1.0)]  # limb (2,3): neck→r-shoulder
    conns[2] = [(0, 0, 1.0), (1, 1, 1.0)]  # limb (3,4): shoulder→elbow
    conns[3] = [(0, 0, 1.0), (1, 1, 1.0)]  # limb (4,5): elbow→wrist
    persons = assemble_persons(all_peaks, conns)
    assert len(persons) == 2
    assert all(set(p.keys()) == {1, 2, 3, 4} for p in persons)


def test_assemble_persons_reference_filter():
    """The reference drops subset rows with <4 parts or mean score <0.4
    (`body.py:200-205`); spurious short/weak chains must not survive."""
    from fgdm_tpu.annotators.openpose import assemble_persons

    # a 3-part chain (neck→shoulder→elbow): too few parts
    all_peaks = [[] for _ in range(18)]
    all_peaks[1] = [(10, 10, 1.0, 0)]
    all_peaks[2] = [(12, 20, 1.0, 1)]
    all_peaks[3] = [(14, 30, 1.0, 2)]
    conns = [[] for _ in range(19)]
    conns[0] = [(0, 0, 1.0)]
    conns[2] = [(0, 0, 1.0)]
    assert assemble_persons(all_peaks, conns) == []
    # same chain passes with the gate disabled
    assert len(assemble_persons(all_peaks, conns,
                                min_parts=0, min_score=0.0)) == 1

    # 4 parts but weak scores: mean (part+connection)/parts < 0.4
    weak = [[] for _ in range(18)]
    weak[1] = [(10, 10, 0.1, 0)]
    weak[2] = [(12, 20, 0.1, 1)]
    weak[3] = [(14, 30, 0.1, 2)]
    weak[4] = [(16, 40, 0.1, 3)]
    wconns = [[] for _ in range(19)]
    wconns[0] = [(0, 0, 0.1)]
    wconns[2] = [(0, 0, 0.1)]
    wconns[3] = [(0, 0, 0.1)]
    # total = 4·0.1 + 3·0.1 = 0.7 over 4 parts = 0.175 < 0.4 → dropped
    assert assemble_persons(weak, wconns) == []


def test_hand_render_smoke():
    """draw_handpose renders a synthetic 21-keypoint hand: colored finger
    edges + red joints, untouched elsewhere."""
    from fgdm_tpu.annotators.openpose import draw_handpose

    canvas = np.zeros((64, 64, 3), np.uint8)
    rng = np.random.default_rng(0)
    peaks = rng.integers(8, 56, size=(21, 2))
    out = draw_handpose(canvas, [peaks])
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0
    # red joint dots present (BGR red = channel 2 in the cv2 convention
    # the reference uses; stored here as (0, 0, 255) triplets)
    assert (out == np.array([0, 0, 255])).all(-1).any()


def test_hand_estimator_end_to_end():
    """HandEstimator multi-scale flow on a tiny boxsize: averaged heatmaps
    → 21 (x, y) peaks inside the crop; all-zero nets yield (0, 0) rows."""
    from fgdm_tpu.annotators.openpose import HandEstimator, HandPoseNet

    net = HandPoseNet()
    x0 = jnp.zeros((1, 32, 32, 3))
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    est = HandEstimator(params, net)
    img = np.full((32, 32, 3), 128, np.uint8)
    peaks = est(img, boxsize=32)
    assert peaks.shape == (21, 2)
    assert (peaks == 0).all()  # zero net → no detections

    # synthetic localized response: stub the net with a blob on part 0 at
    # the crop's lower-right quadrant → the multi-scale resize/pad/crop/
    # average path must land the peak there
    def fake_net(p, x):
        b, h, w, _ = x.shape
        heat = np.zeros((b, h // 8, w // 8, 22), np.float32)
        heat[:, int(h // 8 * 0.75), int(w // 8 * 0.75), 0] = 4.0
        return jnp.asarray(heat)

    est2 = HandEstimator(params, net)
    est2._jit = fake_net
    peaks2 = est2(img, boxsize=32)
    assert (peaks2[0] != 0).any()          # part 0 detected
    x0, y0 = peaks2[0]
    assert 16 <= x0 < 32 and 16 <= y0 < 32  # in the planted quadrant
    assert (peaks2[1:] == 0).all()         # others silent
