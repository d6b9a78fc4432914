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
