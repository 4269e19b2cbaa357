"""Tests for CLIP scoring, rich-text parsing, bbox utils."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fgdm_tpu.models.clip import CLIPTextEncoder, CLIPTokenizer
from fgdm_tpu.utils.bbox import (
    bbox_clip_xyxy,
    bbox_iou,
    bbox_xywh_to_xyxy,
    bbox_xyxy_to_xywh,
)
from fgdm_tpu.utils.clip_score import CLIPScorer, CLIPVisionEncoder
from fgdm_tpu.utils.richtext import find_nearest_color, hex_to_rgb, parse_json


def test_clip_scorer_end_to_end():
    vision = CLIPVisionEncoder(image_size=32, patch_size=8, hidden=64,
                               layers=2, heads=4, proj_dim=32)
    text = CLIPTextEncoder(vocab_size=49408, embed_dim=48, num_layers=2,
                           num_heads=4)
    vp = vision.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    tp = text.init(jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32))
    proj = jax.random.normal(jax.random.PRNGKey(2), (48, 32))
    scorer = CLIPScorer(vp, tp, proj, vision_def=vision, text_def=text)
    tok = CLIPTokenizer()
    ids = jnp.asarray(tok(["a cat", "a dog"]))
    imgs = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3))
    s = scorer.score(imgs, ids)
    assert s.shape == (2,)
    assert np.all(np.abs(np.asarray(s)) <= 1.0 + 1e-5)


def test_richtext_parse():
    payload = {"ops": [
        {"insert": "a house "},
        {"insert": "garden", "attributes": {"font": "slabo"}},
        {"insert": " with a "},
        {"insert": "red door", "attributes": {"color": "#ff0000"}},
        {"insert": "sun", "attributes": {"size": "60px"}},
        {"insert": "moon", "attributes": {"link": "a glowing moon"}},
    ]}
    (base, styles, footnotes, targets, color_prompts, color_names,
     color_rgbs, sizes, grad) = parse_json(payload)
    assert base == "a house garden with a red doorsunmoon"
    assert styles == ["garden in the style of Vincent Van Gogh"]
    assert color_prompts == ["red door"] and color_names == ["red"]
    assert grad is True
    assert sizes == [["sun", 20.0]]
    assert footnotes == ["a glowing moon"] and targets == ["moon"]


def test_hex_and_nearest_color():
    np.testing.assert_allclose(hex_to_rgb("#ff8000"),
                               [1.0, 128 / 255, 0.0], atol=1e-6)
    assert find_nearest_color([250, 5, 5]) == "red"
    assert find_nearest_color([0, 0, 10]) == "black"


def test_bbox_roundtrip_and_iou():
    xywh = np.array([10, 20, 30, 40], np.float32)
    xyxy = bbox_xywh_to_xyxy(xywh)
    np.testing.assert_allclose(bbox_xyxy_to_xywh(xyxy), xywh)
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    iou = bbox_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 1.0)
    assert 0 < iou[0, 1] < 0.5 and iou[0, 2] == 0
    clipped = bbox_clip_xyxy(np.array([-5, -5, 200, 200], np.float32), 100, 50)
    np.testing.assert_allclose(clipped, [0, 0, 99, 49])
