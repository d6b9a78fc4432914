"""Anchor <-> ground-truth target assignment, fixed-shape.

Rebuild of the reference's matcher (SURVEY.md §2 "Target assignment";
canonical RetinaNet rule used by the paper's base detector): per anchor,
max-IoU over GT boxes decides

  IoU >= match_iou_positive  -> positive, regress to the argmax GT
  IoU <  match_iou_negative  -> negative (background)
  in between                 -> ignored (contributes to neither loss)

plus the standard force-match: every valid GT claims its own max-IoU anchor as
positive even below threshold, so no GT goes unsupervised.

Everything is fixed-shape: GT arrives padded to [G, 4] with a validity mask,
outputs are per-anchor dense tensors [A, ...] suitable for a jit train step —
the reference assigns targets inside its tf.data pipeline / loss on dynamic
length lists; here assignment runs on device inside the train step, so the
host pipeline ships only raw padded GT.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesod_tpu.ops import boxes as box_ops


class AnchorTargets(NamedTuple):
    """Dense per-anchor supervision (all [A, ...])."""

    class_targets: jnp.ndarray  # [A] int32 — 0 = background, 1..C = foreground
    box_targets: jnp.ndarray  # [A, 4] encoded deltas (defined where positive)
    positive: jnp.ndarray  # [A] bool
    ignored: jnp.ndarray  # [A] bool — excluded from the classification loss


def assign_targets(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    iou_positive: float = 0.5,
    iou_negative: float = 0.4,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
) -> AnchorTargets:
    """Match A anchors against G (padded) GT boxes.

    Args:
      anchors:    [A, 4] corner anchors.
      gt_boxes:   [G, 4] corner GT, padded with arbitrary rows.
      gt_classes: [G] int32 foreground labels in 1..C (0 rows allowed in pad).
      gt_valid:   [G] bool padding mask.
    """
    iou = box_ops.pairwise_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)  # padded GT never matches

    best_gt = jnp.argmax(iou, axis=1)  # [A]
    best_iou = jnp.max(iou, axis=1)  # [A]

    positive = best_iou >= iou_positive
    # best_iou == -1 (no valid GT overlaps at all) is plain background.
    negative = best_iou < iou_negative

    # Force-match: each valid GT claims its best anchor (ties -> lowest anchor
    # index, argmax order). A zero-valid-GT image degenerates cleanly: all
    # anchors negative.
    any_valid = jnp.any(gt_valid)
    gt_best_anchor = jnp.argmax(iou, axis=0)  # [G]
    forced = jnp.zeros(anchors.shape[0], jnp.bool_).at[gt_best_anchor].set(
        gt_valid, mode="drop"
    )
    # Forced anchors regress to the GT that claimed them, which by
    # construction is also (one of) their max-IoU GT among claimed rows; using
    # best_gt is exact when one GT claims the anchor, and picks the higher-IoU
    # GT under collisions — same resolution the reference's matcher makes.
    positive = (positive | forced) & any_valid
    negative = negative & ~positive

    # One-hot-matmul row selection instead of gt_boxes[best_gt]: XLA lowers
    # an A-sized indexed gather to a serial dynamic-slice loop on TPU, and
    # the two gathers here measured 0.95 GB/img of the train step's HBM
    # traffic (DESIGN.md §8 "THE TPU GATHER RULE"; the one-hot form is
    # 0.16 GB/img for the whole assignment). precision=HIGHEST is REQUIRED
    # for the bit-for-bit claim: TPU's DEFAULT fp32 matmul precision is a
    # single bf16 pass, which rounds pixel coordinates >256 to 8 mantissa
    # bits (up to ~4 px at 1280 — silently noisy regression targets; the
    # round-5 candidate_unsort bug was the same hazard). With HIGHEST the
    # 1.0 x value products reconstruct full fp32 exactly.
    one_hot = jax.nn.one_hot(best_gt, gt_boxes.shape[0], dtype=jnp.float32)
    matched_boxes = jnp.matmul(
        one_hot, gt_boxes.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )  # [A, 4]
    matched_classes = jnp.matmul(
        one_hot, gt_classes.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)  # [A]

    class_targets = jnp.where(positive, matched_classes, 0)
    box_targets = box_ops.encode_boxes(matched_boxes, anchors, scale_factors)
    ignored = ~positive & ~negative
    return AnchorTargets(
        class_targets=class_targets,
        box_targets=box_targets,
        positive=positive,
        ignored=ignored,
    )
