"""Probability-based Detection Quality (PDQ) for probabilistic boxes.

The probabilistic-detection metric of Hall et al., "Probabilistic Object
Detection: Definition and Evaluation" (arXiv:1811.10800) — the natural
headline metric for BayesOD-style detectors (SURVEY.md §2 "Evaluator" lists
PDQ-style scoring as the reference-era probabilistic eval; the reference's own
evaluator ships MUE, so PDQ here extends the eval surface rather than porting
a file). Unlike mAP, PDQ rewards *calibrated* spatial and semantic
uncertainty:

  per detection-GT pair (pPDQ):
    spatial quality   Q_s = exp(-(L_fg + L_bg))
      L_fg = -(1/|S|) sum_{pixels in GT box}          log p_det(pixel)
      L_bg = -(1/|S|) sum_{pixels outside GT box}     log(1 - p_det(pixel))
      with |S| = #GT-box pixels and p_det the detection's per-pixel
      foreground probability induced by its Gaussian corners:
          p(u, v) = [Phi((u-x1)/s_x1) * Phi((x2-u)/s_x2)]
                  * [Phi((v-y1)/s_y1) * Phi((y2-v)/s_y2)]
      (corner sigmas = sqrt of the 4x4 corner covariance's diagonal — the
      diagonal marginal of BayesOD's full covariance, matching the official
      toolkit's per-corner Gaussian heatmaps).
    label quality     Q_l = p_det(class = GT class)
    pPDQ = sqrt(Q_s * Q_l)                 (geometric mean)

  per dataset:
    optimal per-image detection<->GT assignment maximizing total pPDQ
    (Hungarian); assigned pairs with pPDQ > 0 are TPs.
    PDQ = sum(assigned pPDQ) / (TP + FP + FN)

Host-side NumPy over dumped detection records, like the rest of eval/. The
background sum is restricted to the union of the GT box and the detection's
3-sigma extent (outside it log(1-p) ~ 0), so cost stays proportional to
object size, not image size.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence, Tuple

import numpy as np
from scipy.optimize import linear_sum_assignment
from scipy.special import erf

_SQRT2 = math.sqrt(2.0)
_EPS = 1e-14
# Pair gate: skip (and score 0) pairs whose 3-sigma extents don't intersect.
_SIGMA_EXTENT = 3.0
_MIN_SIGMA = 1e-2  # degenerate covariances -> effectively hard corners


def _phi(z: np.ndarray) -> np.ndarray:
    """Standard normal CDF (vectorized, no scipy.stats dependency)."""
    return 0.5 * (1.0 + erf(z / _SQRT2))


def _axis_prob(
    u: np.ndarray, lo: float, s_lo: float, hi: float, s_hi: float
) -> np.ndarray:
    """P[pixel coordinate u is inside (lo, hi)] for Gaussian edges."""
    return _phi((u - lo) / max(s_lo, _MIN_SIGMA)) * _phi(
        (hi - u) / max(s_hi, _MIN_SIGMA)
    )


def ppdq(
    det_box: np.ndarray,
    det_cov: np.ndarray,
    det_probs: np.ndarray,
    gt_box: np.ndarray,
    gt_label: int,
    image_hw: Tuple[int, int],
) -> float:
    """Pairwise pPDQ for one detection against one GT box.

    det_box/gt_box: [4] corners (x1, y1, x2, y2) in pixel coordinates.
    det_cov: [4, 4] corner covariance; det_probs: [C+1] incl. background.
    """
    h, w = image_hw
    sig = np.sqrt(np.clip(np.diag(np.asarray(det_cov, np.float64)), 0.0, None))
    x1, y1, x2, y2 = (float(v) for v in det_box)

    # Evaluation region: GT box union detection's 3-sigma extent, clipped.
    rx0 = int(np.floor(max(0.0, min(gt_box[0], x1 - _SIGMA_EXTENT * sig[0]))))
    ry0 = int(np.floor(max(0.0, min(gt_box[1], y1 - _SIGMA_EXTENT * sig[1]))))
    rx1 = int(np.ceil(min(w, max(gt_box[2], x2 + _SIGMA_EXTENT * sig[2]))))
    ry1 = int(np.ceil(min(h, max(gt_box[3], y2 + _SIGMA_EXTENT * sig[3]))))
    if rx1 <= rx0 or ry1 <= ry0:
        return 0.0

    # GT pixel set: pixel centers inside the GT box.
    u = np.arange(rx0, rx1, dtype=np.float64) + 0.5  # [W_r]
    v = np.arange(ry0, ry1, dtype=np.float64) + 0.5  # [H_r]
    gt_u = (u >= gt_box[0]) & (u < gt_box[2])
    gt_v = (v >= gt_box[1]) & (v < gt_box[3])
    n_gt = int(gt_u.sum()) * int(gt_v.sum())
    if n_gt == 0:
        return 0.0

    fx = _axis_prob(u, x1, sig[0], x2, sig[2])  # [W_r]
    fy = _axis_prob(v, y1, sig[1], y2, sig[3])  # [H_r]
    p = fy[:, None] * fx[None, :]  # [H_r, W_r]
    in_gt = gt_v[:, None] & gt_u[None, :]

    loss_fg = -np.sum(np.log(np.maximum(p[in_gt], _EPS)))
    loss_bg = -np.sum(np.log(np.maximum(1.0 - p[~in_gt], _EPS)))
    q_spatial = math.exp(-(loss_fg + loss_bg) / n_gt)
    q_label = float(det_probs[gt_label])
    return math.sqrt(q_spatial * q_label)


def image_pdq(
    det_boxes: np.ndarray,
    det_covs: np.ndarray,
    det_probs: np.ndarray,
    gt_boxes: np.ndarray,
    gt_labels: np.ndarray,
    image_hw: Tuple[int, int],
) -> Dict[str, float]:
    """Optimal-assignment PDQ tallies for one image.

    Returns {"ppdq_sum", "tp", "fp", "fn"} — aggregate over images and
    divide (PDQ is dataset-level, not a mean of per-image scores).
    """
    n_det, n_gt = len(det_boxes), len(gt_boxes)
    if n_det == 0 or n_gt == 0:
        return {"ppdq_sum": 0.0, "tp": 0, "fp": n_det, "fn": n_gt}

    quality = np.zeros((n_det, n_gt))
    for d in range(n_det):
        sig = np.sqrt(
            np.clip(np.diag(np.asarray(det_covs[d], np.float64)), 0.0, None)
        )
        ext = np.asarray(det_boxes[d], np.float64) + _SIGMA_EXTENT * np.array(
            [-sig[0], -sig[1], sig[2], sig[3]]
        )
        for g in range(n_gt):
            gb = np.asarray(gt_boxes[g], np.float64)
            # Gate: no overlap between 3-sigma extent and GT box -> pPDQ ~ 0
            # spatially (and the background loss would be huge anyway).
            if (
                ext[2] <= gb[0] or gb[2] <= ext[0]
                or ext[3] <= gb[1] or gb[3] <= ext[1]
            ):
                continue
            quality[d, g] = ppdq(
                det_boxes[d], det_covs[d], det_probs[d],
                gb, int(gt_labels[g]), image_hw,
            )

    # A detection with degenerate geometry (inf/NaN box, cov, or prob —
    # possible from extreme modes at low score thresholds) would poison
    # the Hungarian solver; its pairing quality is semantically zero, so
    # it falls through to FP if unmatched. (linear_sum_assignment raises
    # on ANY non-finite entry.)
    quality = np.where(np.isfinite(quality), quality, 0.0)
    rows, cols = linear_sum_assignment(-quality)
    assigned = quality[rows, cols]
    tp = int(np.sum(assigned > 0.0))
    return {
        "ppdq_sum": float(assigned.sum()),
        "tp": tp,
        "fp": n_det - tp,
        "fn": n_gt - tp,
    }


def pdq_score(
    images: Sequence[Dict[str, np.ndarray]],
    image_hw: Tuple[int, int] = None,
) -> Dict[str, float]:
    """Dataset PDQ over per-image dicts with keys det_boxes, det_covs,
    det_probs, gt_boxes, gt_labels (arrays; empty allowed) and optionally
    a per-image "hw" (falls back to the shared `image_hw`)."""
    tot = {"ppdq_sum": 0.0, "tp": 0, "fp": 0, "fn": 0}
    for im in images:
        hw = tuple(im.get("hw", image_hw) or ())
        if len(hw) != 2:
            raise ValueError("pdq_score needs per-image 'hw' or image_hw")
        r = image_pdq(
            np.asarray(im["det_boxes"], np.float64).reshape(-1, 4),
            np.asarray(im["det_covs"], np.float64).reshape(-1, 4, 4),
            np.asarray(im["det_probs"], np.float64),
            np.asarray(im["gt_boxes"], np.float64).reshape(-1, 4),
            np.asarray(im["gt_labels"], np.int64).reshape(-1),
            hw,
        )
        for k in tot:
            tot[k] += r[k]
    denom = tot["tp"] + tot["fp"] + tot["fn"]
    return {
        "pdq": tot["ppdq_sum"] / denom if denom else 0.0,
        "pdq_tp": float(tot["tp"]),
        "pdq_fp": float(tot["fp"]),
        "pdq_fn": float(tot["fn"]),
        "avg_ppdq_tp": tot["ppdq_sum"] / tot["tp"] if tot["tp"] else 0.0,
    }
