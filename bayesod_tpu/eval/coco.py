"""COCO-protocol detection evaluation (AP@[.50:.95], area ranges, AR).

BASELINE.json config #4 names "COCO-scale eval"; the reference itself ships
no COCO evaluator (SURVEY.md §2 — BDD+KITTI only), so this module implements
the official COCO protocol fresh, pure NumPy, no pycocotools dependency:

  * AP averaged over 10 IoU thresholds 0.50:0.05:0.95, 101-point
    interpolated precision sampled at recall 0.00:0.01:1.00;
  * AP50 / AP75 single-threshold cuts;
  * area-range splits (all / small <32^2 / medium / large >96^2), where
    out-of-range GT is ignored and out-of-range unmatched detections are
    dropped from the ranking (not FPs) — the cocoeval ignore semantics;
  * crowd regions: ignored GT that MAY be matched by multiple detections,
    with affinity = intersection / detection area (a detection inside a
    crowd is "explained" no matter how small a fraction of the crowd it
    covers);
  * AR@{1,10,100} (max recall at detection budgets, averaged over IoUs).

Matching per (class, IoU threshold): detections in descending score order
greedily take the best still-free GT; non-ignored GT is preferred over
ignored even at lower IoU (a detection never "wastes" on an ignore region
while a real object is available above threshold).

Everything host-side offline over dumped records, like the rest of eval/
(SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.50, 0.96, 0.05), 2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)
AREA_RANGES: Dict[str, Tuple[float, float]] = {
    "all": (0.0, float("inf")),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, float("inf")),
}


@dataclasses.dataclass
class CocoImage:
    """One image's per-class-agnostic eval input (corner boxes).

    gt_areas defaults to box area; COCO proper uses the segmentation
    ``area`` field, which dataset handlers should pass through when present.
    """

    det_boxes: np.ndarray  # [D, 4]
    det_scores: np.ndarray  # [D]
    det_classes: np.ndarray  # [D] int
    gt_boxes: np.ndarray  # [G, 4]
    gt_classes: np.ndarray  # [G] int
    gt_areas: Optional[np.ndarray] = None  # [G]
    crowd_boxes: Optional[np.ndarray] = None  # [X, 4]
    crowd_classes: Optional[np.ndarray] = None  # [X] int

    def __post_init__(self):
        if self.gt_areas is None:
            wh = np.clip(self.gt_boxes[:, 2:] - self.gt_boxes[:, :2], 0, None)
            self.gt_areas = (wh[:, 0] * wh[:, 1]).astype(np.float64)
        if self.crowd_boxes is None:
            self.crowd_boxes = np.zeros((0, 4), np.float32)
            self.crowd_classes = np.zeros((0,), np.int32)


def _iou(dets: np.ndarray, gts: np.ndarray, crowd: bool) -> np.ndarray:
    """[D, G] affinity: IoU, or intersection/det-area against crowd regions.

    Computed in float64 like cocoeval: a float32 quotient such as 70/100
    lands at 0.69999998 and silently fails the `>= 0.70` threshold cut."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)), np.float64)
    dets = np.asarray(dets, np.float64)
    gts = np.asarray(gts, np.float64)
    lt = np.maximum(dets[:, None, :2], gts[None, :, :2])
    rb = np.minimum(dets[:, None, 2:], gts[None, :, 2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = np.prod(np.clip(dets[:, 2:] - dets[:, :2], 0, None), axis=1)
    if crowd:
        return np.where(area_d[:, None] > 0, inter / np.maximum(area_d[:, None], 1e-9), 0.0)
    area_g = np.prod(np.clip(gts[:, 2:] - gts[:, :2], 0, None), axis=1)
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-9), 0.0)


def _match_class_image(
    im: CocoImage,
    class_id: int,
    area_range: Tuple[float, float],
    max_dets: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Match one (image, class) across ALL IoU thresholds at once.

    Returns (scores [D'], tp [T, D'] bool, drop [T, D'] bool, num_required)
    with T = len(IOU_THRESHOLDS); ``drop`` marks detections to remove from
    the ranking at that threshold (matched-to-ignored or out-of-range
    unmatched).
    """
    dsel = im.det_classes == class_id
    order = np.argsort(-im.det_scores[dsel], kind="stable")[:max_dets]
    dets = im.det_boxes[dsel][order]
    scores = im.det_scores[dsel][order]

    gsel = im.gt_classes == class_id
    gts = im.gt_boxes[gsel]
    areas = im.gt_areas[gsel]
    gt_ignored = (areas < area_range[0]) | (areas > area_range[1])

    csel = im.crowd_classes == class_id
    crowds = im.crowd_boxes[csel]

    iou = _iou(dets, gts, crowd=False)
    ioa = _iou(dets, crowds, crowd=True)

    T = len(IOU_THRESHOLDS)
    D = len(dets)
    tp = np.zeros((T, D), bool)
    drop = np.zeros((T, D), bool)
    wh = np.clip(dets[:, 2:] - dets[:, :2], 0, None)
    det_out_of_range = (wh[:, 0] * wh[:, 1] < area_range[0]) | (
        wh[:, 0] * wh[:, 1] > area_range[1]
    )
    for t, thr in enumerate(IOU_THRESHOLDS):
        taken = np.zeros(len(gts), bool)
        for d in range(D):
            matched = False
            if len(gts):
                cand = np.where(~taken & (iou[d] >= thr))[0]
                required = cand[~gt_ignored[cand]]
                if len(required):
                    g = required[np.argmax(iou[d, required])]
                    taken[g] = True
                    tp[t, d] = True
                    matched = True
                elif len(cand):
                    g = cand[np.argmax(iou[d, cand])]
                    taken[g] = True  # in-class but out-of-range GT: consumed
                    drop[t, d] = True
                    matched = True
            if not matched and len(crowds) and (ioa[d] >= thr).any():
                drop[t, d] = True  # crowd regions absorb any number of dets
                matched = True
            if not matched and det_out_of_range[d]:
                drop[t, d] = True  # unmatched out-of-range det: not an FP
    num_required = int((~gt_ignored).sum())
    return scores, tp, drop, num_required


def _ap_101(recall: np.ndarray, precision: np.ndarray) -> float:
    """COCO AP: precision envelope sampled at the 101 recall points."""
    if len(recall) == 0:
        return 0.0
    prec = np.maximum.accumulate(precision[::-1])[::-1]
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    valid = idx < len(prec)
    return float(np.where(valid, prec[np.minimum(idx, len(prec) - 1)], 0.0).mean())


def _accumulate(
    per_image: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, int]],
) -> Tuple[np.ndarray, np.ndarray]:
    """Reduce one (class, area, max_dets) cell to per-threshold (AP, maxrec).

    Returns (ap [T], max_recall [T]); NaN where the class has no GT in range
    (cell excluded from the mean, cocoeval convention).
    """
    T = len(IOU_THRESHOLDS)
    num_gt = sum(r[3] for r in per_image)
    if num_gt == 0:
        return np.full(T, np.nan), np.full(T, np.nan)
    scores = np.concatenate([r[0] for r in per_image])
    tps = np.concatenate([r[1] for r in per_image], axis=1)  # [T, D_total]
    drops = np.concatenate([r[2] for r in per_image], axis=1)
    order = np.argsort(-scores, kind="stable")
    ap = np.zeros(T)
    max_rec = np.zeros(T)
    for t in range(T):
        keep = ~drops[t][order]
        tp = np.cumsum(tps[t][order][keep].astype(np.float64))
        fp = np.cumsum((~tps[t][order][keep]).astype(np.float64))
        recall = tp / num_gt
        precision = tp / np.maximum(tp + fp, 1e-12)
        ap[t] = _ap_101(recall, precision)
        max_rec[t] = float(recall[-1]) if len(recall) else 0.0
    return ap, max_rec


def _nanmean0(arr: np.ndarray) -> float:
    """Mean over finite cells; 0.0 when empty or all-NaN (and warning-free,
    unlike np.nanmean on an all-NaN slice)."""
    finite = np.asarray(arr)[np.isfinite(arr)]
    return float(finite.mean()) if finite.size else 0.0


def evaluate_coco(
    images: Sequence[CocoImage],
    class_ids: Sequence[int],
    max_dets: int = 100,
    ar_budgets: Sequence[int] = (1, 10, 100),
) -> Dict[str, float]:
    """Full COCO summary over a split.

    Returns {"coco_ap", "coco_ap50", "coco_ap75", "coco_ap_small/medium/
    large", "coco_ar@K"...} plus per-class "coco_ap_cls<j>"; means skip
    classes with no in-range GT (NaN cells), as cocoeval does.
    """
    metrics: Dict[str, float] = {}
    ap_all: List[np.ndarray] = []  # per class, [T]
    t50 = int(np.argmin(np.abs(IOU_THRESHOLDS - 0.50)))
    t75 = int(np.argmin(np.abs(IOU_THRESHOLDS - 0.75)))
    for cid in class_ids:
        cell = [
            _match_class_image(im, cid, AREA_RANGES["all"], max_dets)
            for im in images
        ]
        ap, _ = _accumulate(cell)
        ap_all.append(ap)
        if np.isfinite(ap).all():
            metrics[f"coco_ap_cls{cid}"] = float(ap.mean())
    ap_mat = np.stack(ap_all) if ap_all else np.zeros((0, len(IOU_THRESHOLDS)))
    metrics["coco_ap"] = _nanmean0(ap_mat)
    metrics["coco_ap50"] = _nanmean0(ap_mat[:, t50]) if ap_mat.size else 0.0
    metrics["coco_ap75"] = _nanmean0(ap_mat[:, t75]) if ap_mat.size else 0.0
    for name in ("small", "medium", "large"):
        vals = []
        for cid in class_ids:
            cell = [
                _match_class_image(im, cid, AREA_RANGES[name], max_dets)
                for im in images
            ]
            ap, _ = _accumulate(cell)
            vals.append(ap)
        stacked = np.stack(vals) if vals else np.zeros((0, 1))
        metrics[f"coco_ap_{name}"] = _nanmean0(stacked)
    for k in ar_budgets:
        recs = []
        for cid in class_ids:
            cell = [
                _match_class_image(im, cid, AREA_RANGES["all"], k)
                for im in images
            ]
            _, mr = _accumulate(cell)
            recs.append(mr)
        stacked = np.stack(recs) if recs else np.zeros((0, 1))
        metrics[f"coco_ar@{k}"] = _nanmean0(stacked)
    return metrics
