"""Box geometry primitives: conversions, IoU, encode/decode, covariance decode.

TPU-native rebuild of the reference's box utilities
(ref: src/retina_net/anchor_generator/box_utils.py — corners<->centroid
conversion, pairwise IoU, Faster-RCNN-style encode/decode vs anchors, and the
covariance transform from encoded space to pixel space required by BayesOD's
Gaussian fusion; see SURVEY.md §2 "Box utils" and arXiv:1903.03838 §III.A).

Everything here is a pure, shape-polymorphic jnp function designed to live
inside a single jit graph: no Python branching on data, fp32 math throughout
(covariance numerics are unstable in bf16 — see SURVEY.md §7 hard part (b)).

Box formats:
  corners:  (x1, y1, x2, y2)   -- pixel coordinates, x2 > x1, y2 > y1
  centroid: (cx, cy, w, h)

Encoded (anchor-relative) format, Faster-RCNN parametrization:
  t = (sx*(cx-cxa)/wa, sy*(cy-cya)/ha, sw*log(w/wa), sh*log(h/ha))
with configurable scale factors s = (sx, sy, sw, sh); the canonical RetinaNet
setting is (1, 1, 1, 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Clamp on predicted log-size deltas, log(1000/16) — standard detectron-era
# guard preventing exp() overflow on early-training garbage predictions.
BBOX_XFORM_CLIP = 4.135166556742356

# Linear map taking centroid-space (cx, cy, w, h) to corner-space
# (x1, y1, x2, y2): x1 = cx - w/2, etc. Used both for box conversion and for
# pushing covariances between the two parametrizations (Sigma_corner =
# L @ Sigma_centroid @ L.T).
_CENTROID_TO_CORNER = np.array(
    [
        [1.0, 0.0, -0.5, 0.0],
        [0.0, 1.0, 0.0, -0.5],
        [1.0, 0.0, 0.5, 0.0],
        [0.0, 1.0, 0.0, 0.5],
    ],
    dtype=np.float32,
)  # numpy on purpose: a module-scope jnp.array would initialize the device
#    backend at import time (hangs every CLI when the TPU tunnel is down).


def centroid_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) centroid (cx, cy, w, h) -> corners (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def corners_to_centroid(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corners (x1, y1, x2, y2) -> centroid (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [0.5 * (x1 + x2), 0.5 * (y1 + y2), x2 - x1, y2 - y1], axis=-1
    )


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) corner boxes -> (...) areas; degenerate boxes clamp to 0."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return (jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0))[..., 0]


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between corner boxes a [..., N, 4] and b [..., M, 4].

    Returns [..., N, M] in fp32. Safe on degenerate / zero-area boxes
    (returns 0 rather than NaN).
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])  # [...,N,M,2]
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return jnp.where(union > 0.0, inter / jnp.maximum(union, 1e-9), 0.0)


def encode_boxes(
    boxes: jnp.ndarray, anchors: jnp.ndarray, scale_factors=(1.0, 1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """Encode corner `boxes` relative to corner `anchors` -> deltas [..., 4]."""
    boxes_c = corners_to_centroid(boxes.astype(jnp.float32))
    anch_c = corners_to_centroid(anchors.astype(jnp.float32))
    sx, sy, sw, sh = scale_factors
    # Guard against degenerate GT boxes (never anchors, which are generated).
    wa = jnp.maximum(anch_c[..., 2], 1e-6)
    ha = jnp.maximum(anch_c[..., 3], 1e-6)
    w = jnp.maximum(boxes_c[..., 2], 1e-6)
    h = jnp.maximum(boxes_c[..., 3], 1e-6)
    return jnp.stack(
        [
            sx * (boxes_c[..., 0] - anch_c[..., 0]) / wa,
            sy * (boxes_c[..., 1] - anch_c[..., 1]) / ha,
            sw * jnp.log(w / wa),
            sh * jnp.log(h / ha),
        ],
        axis=-1,
    )


def _decode_centroid(deltas, anchors, scale_factors):
    """Shared decode core -> (centroid boxes [..., 4], anchors centroid)."""
    deltas = deltas.astype(jnp.float32)
    anch_c = corners_to_centroid(anchors.astype(jnp.float32))
    sx, sy, sw, sh = scale_factors
    wa, ha = anch_c[..., 2], anch_c[..., 3]
    cx = anch_c[..., 0] + deltas[..., 0] / sx * wa
    cy = anch_c[..., 1] + deltas[..., 1] / sy * ha
    w = wa * jnp.exp(jnp.minimum(deltas[..., 2] / sw, BBOX_XFORM_CLIP))
    h = ha * jnp.exp(jnp.minimum(deltas[..., 3] / sh, BBOX_XFORM_CLIP))
    return jnp.stack([cx, cy, w, h], axis=-1), anch_c


def decode_boxes(
    deltas: jnp.ndarray, anchors: jnp.ndarray, scale_factors=(1.0, 1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """Decode predicted deltas [..., 4] vs corner anchors -> corner boxes."""
    boxes_c, _ = _decode_centroid(deltas, anchors, scale_factors)
    return centroid_to_corners(boxes_c)


def decode_jacobian_diag(
    deltas: jnp.ndarray, anchors: jnp.ndarray, scale_factors=(1.0, 1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """Diagonal of d(centroid box)/d(deltas) at the decoded point, [..., 4].

    The decode map t -> (cx, cy, w, h) is elementwise:
      d cx / d tx = wa / sx          d w / d tw = w / sw   (w = decoded width)
      d cy / d ty = ha / sy          d h / d th = h / sh
    BayesOD predicts a *diagonal* covariance in encoded space; this Jacobian
    pushes it to centroid pixel space (first-order delta method), after which
    the constant linear map `_CENTROID_TO_CORNER` takes it to corner space.
    (paper §III.A: variances are regressed in the transformed/encoded domain.)
    """
    boxes_c, anch_c = _decode_centroid(deltas, anchors, scale_factors)
    sx, sy, sw, sh = scale_factors
    # anchors may broadcast against a leading sample axis on deltas.
    ones = jnp.ones_like(boxes_c[..., 2])
    return jnp.stack(
        [
            anch_c[..., 2] / sx * ones,
            anch_c[..., 3] / sy * ones,
            boxes_c[..., 2] / sw,
            boxes_c[..., 3] / sh,
        ],
        axis=-1,
    )


def decode_covariance(
    log_vars: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
) -> jnp.ndarray:
    """Push encoded-space diag covariance to corner-space full 4x4, [..., 4, 4].

    Args:
      log_vars: predicted log sigma^2 in encoded space, [..., 4].
      deltas:   predicted box deltas (defines the linearization point), [..., 4].
      anchors:  corner anchors, [..., 4].

    Returns Sigma = L @ J @ diag(exp(log_vars)) @ J @ L.T with J diagonal,
    i.e. a full (correlated) corner-space covariance even though the encoded
    covariance is diagonal — the corner coordinates share cx/w terms.
    """
    log_vars = jnp.clip(log_vars.astype(jnp.float32), -log_var_clip, log_var_clip)
    var_enc = jnp.exp(log_vars)
    jdiag = decode_jacobian_diag(deltas, anchors, scale_factors)
    var_centroid = var_enc * jdiag * jdiag  # [..., 4] diag in centroid space
    # L diag(v) L^T, computed without materializing the diag matrix:
    lv = _CENTROID_TO_CORNER * var_centroid[..., None, :]  # [..., 4, 4]
    return jnp.einsum("...ik,jk->...ij", lv, _CENTROID_TO_CORNER)


def clip_boxes(boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
    """Clip corner boxes to [0, W] x [0, H]."""
    h, w = image_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
