"""Average Precision: greedy IoU matching + interpolated PR integration.

Rebuild of the reference's evaluator core (SURVEY.md §2 "Evaluator", §3.3):
per-class AP with

  * KITTI protocol: per-difficulty GT gating (easy/moderate/hard), per-class
    IoU thresholds (0.7 car, 0.5 pedestrian/cyclist), R40 interpolation
    (40 recall points, the post-2019 official devkit standard), and
    ignored-GT handling (GT outside the difficulty bin doesn't count as FP
    when matched).
  * generic VOC/BDD-style protocol: single IoU threshold, all-point or
    101-point interpolation.

Host-side NumPy exactly like the reference — eval is offline over dumped
detections; no device work (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def _iou_matrix(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """Pairwise IoU [D, G] between corner boxes (numpy)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)), np.float32)
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = np.prod(np.clip(dets[:, 2:] - dets[:, :2], 0, None), axis=1)
    area_g = np.prod(np.clip(gts[:, 2:] - gts[:, :2], 0, None), axis=1)
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


@dataclasses.dataclass
class ImageEval:
    """Per-image, per-class matching input.

    ignored_gt marks GT that should neither be required (no FN) nor punished
    (no FP on match) — KITTI difficulty gating and DontCare regions.
    """

    det_boxes: np.ndarray  # [D, 4]
    det_scores: np.ndarray  # [D]
    gt_boxes: np.ndarray  # [G, 4]
    ignored_gt: np.ndarray  # [G] bool


def match_image(
    ev: ImageEval, iou_threshold: float
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Greedy score-ordered matching for one image+class.

    Returns (scores [D'], is_tp [D'], num_required_gt) where detections
    matched to ignored GT are dropped from the ranking entirely (KITTI
    devkit semantics).
    """
    order = np.argsort(-ev.det_scores, kind="stable")
    dets = ev.det_boxes[order]
    scores = ev.det_scores[order]
    iou = _iou_matrix(dets, ev.gt_boxes)
    taken = np.zeros(len(ev.gt_boxes), bool)
    is_tp = np.zeros(len(dets), bool)
    drop = np.zeros(len(dets), bool)
    for d in range(len(dets)):
        if len(ev.gt_boxes) == 0:
            break
        cand = np.where(~taken & (iou[d] >= iou_threshold))[0]
        if len(cand) == 0:
            continue
        # Prefer a required (non-ignored) GT; fall back to ignored.
        required = cand[~ev.ignored_gt[cand]]
        if len(required) > 0:
            g = required[np.argmax(iou[d, required])]
            taken[g] = True
            is_tp[d] = True
        else:
            g = cand[np.argmax(iou[d, cand])]
            taken[g] = True
            drop[d] = True  # matched an ignored GT: remove from ranking
    keep = ~drop
    num_required = int((~ev.ignored_gt).sum())
    return scores[keep], is_tp[keep], num_required


def pr_curve(
    scores: np.ndarray, is_tp: np.ndarray, num_gt: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Global PR curve across all images (scores already concatenated)."""
    if num_gt == 0 or len(scores) == 0:
        return np.zeros(0), np.zeros(0)
    order = np.argsort(-scores, kind="stable")
    tp = np.cumsum(is_tp[order].astype(np.float64))
    fp = np.cumsum((~is_tp[order]).astype(np.float64))
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1e-12)
    return recall, precision


def ap_interpolated(
    recall: np.ndarray, precision: np.ndarray, num_points: int = 40
) -> float:
    """N-point interpolated AP (KITTI R40: sample recall at i/N, i=1..N)."""
    if len(recall) == 0:
        return 0.0
    # Precision envelope (monotone non-increasing from the right).
    prec = np.maximum.accumulate(precision[::-1])[::-1]
    ap = 0.0
    for i in range(1, num_points + 1):
        r = i / num_points
        mask = recall >= r - 1e-12
        ap += float(prec[mask].max()) if mask.any() else 0.0
    return ap / num_points


def ap_all_point(recall: np.ndarray, precision: np.ndarray) -> float:
    """Area under the precision envelope (VOC2010+/COCO-style)."""
    if len(recall) == 0:
        return 0.0
    r = np.concatenate([[0.0], recall, [recall[-1]]])
    p = np.concatenate([[0.0], precision, [0.0]])
    p = np.maximum.accumulate(p[::-1])[::-1]
    idx = np.where(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def compute_ap(
    per_image: Sequence[ImageEval],
    iou_threshold: float,
    num_points: Optional[int] = 40,
    return_curve: bool = False,
) -> Dict[str, float]:
    """AP for one class over a split. num_points=None -> all-point AP.
    return_curve=True adds the raw "recall"/"precision" arrays (for
    eval.plots PR figures)."""
    all_scores, all_tp, total_gt = [], [], 0
    for ev in per_image:
        s, t, n = match_image(ev, iou_threshold)
        all_scores.append(s)
        all_tp.append(t)
        total_gt += n
    scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
    is_tp = np.concatenate(all_tp) if all_tp else np.zeros(0, bool)
    recall, precision = pr_curve(scores, is_tp, total_gt)
    ap = (
        ap_all_point(recall, precision)
        if num_points is None
        else ap_interpolated(recall, precision, num_points)
    )
    out = {
        "ap": ap,
        "num_gt": float(total_gt),
        "num_det": float(len(scores)),
        "max_recall": float(recall[-1]) if len(recall) else 0.0,
    }
    if return_curve:
        out["recall"] = recall
        out["precision"] = precision
    return out


# KITTI per-class matching IoU (official devkit).
KITTI_IOU_THRESHOLDS = {"car": 0.7, "pedestrian": 0.5, "cyclist": 0.5}
