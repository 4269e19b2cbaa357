"""Sketch-adherence metrics for the sketch factor family.

The sketch factor emits PiDiNet-style edge-probability maps; adherence
between a requested sketch and the edges re-detected from the generated
image is scored as binary F1 at a threshold (the standard edge-detection
protocol modulo boundary-matching tolerance, which needs per-dataset
ground truth we don't assume).  Wired as ``cli/eval.py --sketch_dir +
--pidinet_ckpt`` → ``{sketch_f1, sketch_precision, sketch_recall}``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = ["edge_f1"]


def edge_f1(pred: np.ndarray, gt: np.ndarray,
            threshold: float = 0.5) -> Dict[str, float]:
    """[B,H,W] edge probabilities in [0,1] → precision/recall/F1 of the
    thresholded edge sets over the whole batch."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.shape != gt.shape:
        raise ValueError(f"pred {pred.shape} vs gt {gt.shape}")
    p = pred >= threshold
    g = gt >= threshold
    tp = float(np.logical_and(p, g).sum())
    fp = float(np.logical_and(p, ~g).sum())
    fn = float(np.logical_and(~p, g).sum())
    prec = tp / max(tp + fp, 1.0)
    rec = tp / max(tp + fn, 1.0)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return {"sketch_f1": f1, "sketch_precision": prec, "sketch_recall": rec}
