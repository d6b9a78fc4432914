"""Per-anchor posterior aggregation across MC-dropout samples.

Rebuild of the reference's sample-aggregation stage (SURVEY.md §2 "Per-anchor
posterior aggregation"; arXiv:1903.03838 §III.A): for every anchor, across N
stochastic forward passes,

  box mean        mu_hat  = mean_i mu_i           (decoded corner space)
  epistemic cov   Sigma_e = sample covariance of the N decoded means (full 4x4)
  aleatoric cov   Sigma_a = mean_i J_i diag(exp(s_i)) J_i^T  (decoded per
                            sample at its own linearization point)
  total cov       Sigma   = Sigma_e + Sigma_a
  category        p_hat   = mean_i softmax(logits_i)

The reference does this on host in NumPy per image (SURVEY.md §3.2); here it
is a handful of fused fp32 XLA reductions over the sample axis, inside the
same jit graph as the model. Top-k candidate preselection happens BEFORE the
covariance math (infer/detector.py), so these run on k<<A anchors.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from bayesod_tpu.ops import boxes as box_ops


class AnchorPosteriors(NamedTuple):
    """Per-candidate-anchor MC posteriors (all fp32)."""

    boxes: jnp.ndarray  # [..., K, 4]   mean decoded corner boxes
    covs: jnp.ndarray  # [..., K, 4, 4] total covariance (epistemic+aleatoric)
    probs: jnp.ndarray  # [..., K, C+1] mean categorical incl. background


def mean_categorical(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax over the leading sample axis: [N, ..., C+1] -> [..., C+1]."""
    return jnp.mean(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), axis=0)


def mc_box_moments(
    deltas: jnp.ndarray,
    log_vars: jnp.ndarray,
    anchors: jnp.ndarray,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MC box moments in decoded corner space.

    Args:
      deltas:   [N, ..., K, 4] per-sample predicted deltas.
      log_vars: [N, ..., K, 4] per-sample predicted encoded-space log-variances.
      anchors:  [..., K, 4] corner anchors (broadcast against the sample axis).

    Returns (mean_boxes [..., K, 4], total_cov [..., K, 4, 4]).
    Epistemic covariance uses the 1/N (maximum-likelihood) normalizer.
    """
    decoded = box_ops.decode_boxes(deltas, anchors[None], scale_factors)
    mean_boxes = jnp.mean(decoded, axis=0)
    centered = decoded - mean_boxes[None]
    n = deltas.shape[0]
    epistemic = (
        jnp.einsum("n...ki,n...kj->...kij", centered, centered) / float(n)
    )
    aleatoric = jnp.mean(
        box_ops.decode_covariance(
            log_vars, deltas, anchors[None], scale_factors, log_var_clip
        ),
        axis=0,
    )
    return mean_boxes, epistemic + aleatoric


def moments_from_stats(
    stats: jnp.ndarray,
    anchors: jnp.ndarray,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decoded-corner moments from per-anchor MC sufficient statistics.

    `stats` [..., K, 18] are sample averages accumulated by the fused
    regression kernel (ops/pallas/fused_final.dropout_final_reg_stats, lane
    order in its REG_STATS comment) over u = (tx, ty, ew, eh) with
    ew = exp(min(tw/sw, CLIP)), plus the aleatoric exponential moments.
    The decoded corner box is AFFINE in u for a fixed anchor:

        centroid = (ax, ay, 0, 0) + diag(wa/sx, ha/sy, wa, ha) @ u
        corners  = L @ centroid            (L = _CENTROID_TO_CORNER)

    so the sample mean/covariance of decoded corners — exactly what
    mc_box_moments computes from per-sample outputs — equals the affine
    push of (E[u], E[uu^T] - E[u]E[u]^T); and the per-sample aleatoric term
    J_n diag(exp(s_n)) J_n^T averages to the E[v*...] statistics. Same
    math, reordered — mc_box_moments over the same samples is the oracle.
    """
    s = stats.astype(jnp.float32)
    anch_c = box_ops.corners_to_centroid(anchors.astype(jnp.float32))
    sx, sy, sw, sh = scale_factors
    wa, ha = anch_c[..., 2], anch_c[..., 3]

    e_u = s[..., 0:4]  # E[tx], E[ty], E[ew], E[eh]
    # Second-moment matrix M = E[u u^T] from lanes 4..13.
    m = jnp.stack(
        [
            jnp.stack([s[..., 4], s[..., 8], s[..., 9], s[..., 10]], -1),
            jnp.stack([s[..., 8], s[..., 5], s[..., 11], s[..., 12]], -1),
            jnp.stack([s[..., 9], s[..., 11], s[..., 6], s[..., 13]], -1),
            jnp.stack([s[..., 10], s[..., 12], s[..., 13], s[..., 7]], -1),
        ],
        axis=-2,
    )
    cov_u = m - e_u[..., :, None] * e_u[..., None, :]

    d = jnp.stack([wa / sx, ha / sy, wa, ha], axis=-1)  # affine scale diag
    mean_centroid = jnp.stack(
        [
            anch_c[..., 0] + d[..., 0] * e_u[..., 0],
            anch_c[..., 1] + d[..., 1] * e_u[..., 1],
            wa * e_u[..., 2],
            ha * e_u[..., 3],
        ],
        axis=-1,
    )
    mean_boxes = box_ops.centroid_to_corners(mean_centroid)
    cov_centroid = cov_u * d[..., :, None] * d[..., None, :]
    l = box_ops._CENTROID_TO_CORNER
    epistemic = jnp.einsum(
        "ik,...kl,jl->...ij", l, cov_centroid, l
    )

    var_centroid = jnp.stack(
        [
            (wa / sx) ** 2 * s[..., 14],
            (ha / sy) ** 2 * s[..., 15],
            (wa / sw) ** 2 * s[..., 16],
            (ha / sh) ** 2 * s[..., 17],
        ],
        axis=-1,
    )
    lv = l * var_centroid[..., None, :]
    aleatoric = jnp.einsum("...ik,jk->...ij", lv, l)
    return mean_boxes, epistemic + aleatoric


def aggregate(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    log_vars: jnp.ndarray,
    anchors: jnp.ndarray,
    scale_factors=(1.0, 1.0, 1.0, 1.0),
    log_var_clip: float = 10.0,
) -> AnchorPosteriors:
    """Full per-anchor aggregation: [N, ..., K, .] samples -> posteriors."""
    boxes, covs = mc_box_moments(
        deltas, log_vars, anchors, scale_factors, log_var_clip
    )
    return AnchorPosteriors(boxes=boxes, covs=covs, probs=mean_categorical(logits))
