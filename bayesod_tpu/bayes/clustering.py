"""Greedy IoU-affinity clustering as a fixed-shape jit program.

Rebuild of the reference's clustering stage (SURVEY.md §2 "IoU-affinity
clustering"; arXiv:1903.03838 §III.B): the grouping half of NMS without the
discarding half — the highest-scoring surviving box becomes a cluster center
and every surviving box with IoU >= tau joins its cluster *as a measurement*;
repeat. The reference runs this as a host-side Python loop over boxes
(SURVEY.md §3.2 hot loop #2); here it is a `lax.fori_loop` with a static trip
count (max_detections) over a precomputed K x K IoU matrix, so it lives inside
the same jit graph as the model and never leaves the device.

Sequential semantics are preserved exactly: ties in the masked argmax break
toward the lowest index, matching NumPy's argmax order. Greedy NMS (the
non-Bayesian baseline) is the same loop with membership discarded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bayesod_tpu.ops import boxes as box_ops

_NEG_INF = -1e30


class Clusters(NamedTuple):
    centers: jnp.ndarray  # [D] int32 — candidate index of each cluster center
    membership: jnp.ndarray  # [D, K] bool — measurement sets (center included)
    valid: jnp.ndarray  # [D] bool — whether this cluster slot got used


def iou_affinity_clustering(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid_mask: jnp.ndarray,
    affinity_threshold: float,
    max_detections: int,
) -> Clusters:
    """Cluster K candidate boxes greedily by score + IoU affinity.

    Args:
      boxes:      [K, 4] corner boxes (fp32).
      scores:     [K] ranking scores (max foreground prob).
      valid_mask: [K] bool — candidates passing the score threshold.
      affinity_threshold: IoU to join the current center's cluster.
      max_detections: static number of clusters D to extract.

    Returns Clusters with static shapes [D], [D, K], [D].
    """
    k = boxes.shape[0]
    iou = box_ops.pairwise_iou(boxes, boxes)  # [K, K]
    masked0 = jnp.where(valid_mask, scores.astype(jnp.float32), _NEG_INF)

    def body(i, state):
        avail_scores, membership, centers, valid = state
        c = jnp.argmax(avail_scores)
        has_center = avail_scores[c] > _NEG_INF
        members = (
            (iou[c] >= affinity_threshold)
            & (avail_scores > _NEG_INF)
            & has_center
        )
        # The center always belongs to its own cluster (IoU(c, c) = 1).
        membership = membership.at[i].set(members)
        centers = centers.at[i].set(c.astype(jnp.int32))
        valid = valid.at[i].set(has_center)
        avail_scores = jnp.where(members, _NEG_INF, avail_scores)
        return avail_scores, membership, centers, valid

    init = (
        masked0,
        jnp.zeros((max_detections, k), jnp.bool_),
        jnp.zeros((max_detections,), jnp.int32),
        jnp.zeros((max_detections,), jnp.bool_),
    )
    _, membership, centers, valid = jax.lax.fori_loop(
        0, max_detections, body, init
    )
    return Clusters(centers=centers, membership=membership, valid=valid)


def greedy_nms_with(
    cluster_fn,
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid_mask: jnp.ndarray,
    iou_threshold: float,
    max_detections: int,
) -> Clusters:
    """Greedy NMS on top of any clustering implementation (jnp or Pallas):
    identical greedy loop, suppressed boxes are discarded rather than fused,
    so membership rows carry only the center."""
    cl = cluster_fn(boxes, scores, valid_mask, iou_threshold, max_detections)
    k = boxes.shape[0]
    only_center = (
        jax.nn.one_hot(cl.centers, k, dtype=jnp.bool_) & cl.valid[:, None]
    )
    return Clusters(centers=cl.centers, membership=only_center, valid=cl.valid)


def greedy_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid_mask: jnp.ndarray,
    iou_threshold: float,
    max_detections: int,
) -> Clusters:
    """Standard greedy NMS (ref baseline mode, SURVEY.md §2 "Baseline
    post-processing modes") on the jnp clustering path."""
    return greedy_nms_with(
        iou_affinity_clustering,
        boxes, scores, valid_mask, iou_threshold, max_detections,
    )
