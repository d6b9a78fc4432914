"""Evaluation: AP (KITTI/VOC/COCO protocols), uncertainty metrics, drivers
(SURVEY.md §2 "Evaluator", §3.3)."""

from bayesod_tpu.eval.ap import (
    ImageEval,
    KITTI_IOU_THRESHOLDS,
    ap_all_point,
    ap_interpolated,
    compute_ap,
    match_image,
    pr_curve,
)
from bayesod_tpu.eval.coco import CocoImage, evaluate_coco
from bayesod_tpu.eval.pdq import image_pdq, pdq_score, ppdq
from bayesod_tpu.eval.uncertainty import (
    categorical_nll,
    entropy,
    gaussian_entropy,
    gaussian_nll,
    minimum_uncertainty_error,
    uncertainty_report,
)

__all__ = [
    "ImageEval",
    "KITTI_IOU_THRESHOLDS",
    "CocoImage",
    "ap_all_point",
    "ap_interpolated",
    "categorical_nll",
    "compute_ap",
    "evaluate_coco",
    "entropy",
    "gaussian_entropy",
    "gaussian_nll",
    "image_pdq",
    "match_image",
    "minimum_uncertainty_error",
    "pdq_score",
    "ppdq",
    "pr_curve",
    "uncertainty_report",
]
