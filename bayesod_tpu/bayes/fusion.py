"""Bayesian box / category fusion over cluster measurement sets.

Rebuild of the reference's fusion stage (SURVEY.md §2 "Bayesian box/category
fusion"; arXiv:1903.03838 §III.B-C). Per cluster, treating members as
independent measurements of one object:

  box (Gaussian, conjugate):
      Lambda_f = sum_i Lambda_i,     Lambda_i = Sigma_i^{-1}
      mu_f     = Lambda_f^{-1} sum_i Lambda_i mu_i
      Sigma_f  = Lambda_f^{-1}
  category (Dirichlet-categorical, conjugate):
      p_f(c) proportional to p0(c) * prod_i p_i(c)
      i.e. fused logits = log p0 + sum_i log p_i  -> softmax

The reference loops over clusters in host Python; here both fusions are masked
einsum contractions over the full [D, K] membership matrix — fixed shapes,
fp32 islands for the 4x4 inverses (SURVEY.md §7 hard part (b)), one XLA
fusion. Batched 4x4 inverses use a closed-form blockwise Schur inverse
(inv4x4_psd) — pure arithmetic that fuses on TPU and survives jax.export,
where lax.linalg custom calls do not.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from bayesod_tpu.bayes.clustering import Clusters


class FusedDetections(NamedTuple):
    boxes: jnp.ndarray  # [D, 4] fused corner boxes
    covs: jnp.ndarray  # [D, 4, 4] fused covariances
    probs: jnp.ndarray  # [D, C+1] fused categorical incl. background
    scores: jnp.ndarray  # [D] max foreground probability
    entropy: jnp.ndarray  # [D] categorical entropy (nats)
    valid: jnp.ndarray  # [D] bool


def _sym(m: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (m + jnp.swapaxes(m, -1, -2))


def _inv2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 2x2 inverse (... x 2 x 2)."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    return jnp.stack(
        [
            jnp.stack([d * inv_det, -b * inv_det], axis=-1),
            jnp.stack([-c * inv_det, a * inv_det], axis=-1),
        ],
        axis=-2,
    )


def inv4x4_psd(m: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Batched fp32 inverse of symmetric PD 4x4 matrices, CLOSED FORM.

    Blockwise Schur-complement inversion over 2x2 blocks:
        M = [[A, B], [Bᵀ, D]],  S = D - Bᵀ A⁻¹ B  (PD when M is)
        M⁻¹ = [[A⁻¹ + A⁻¹B S⁻¹ BᵀA⁻¹,  -A⁻¹B S⁻¹],
               [-S⁻¹ BᵀA⁻¹,             S⁻¹     ]]
    with closed-form 2x2 inverses. Pure vectorized arithmetic: no
    lax.linalg, so (a) XLA fuses the whole thing into neighboring ops on
    TPU instead of looping an unbatched Cholesky custom call over the
    batch, and (b) the serving graph exports/deserializes cleanly via
    jax.export (this build's CPU LAPACK custom calls segfault when
    executed from a deserialized artifact — infer/export.py).

    `jitter` * I is added first; with PD covariance/precision inputs the
    2x2 pivots are bounded away from zero, and tests pin parity with a
    Cholesky-solve oracle to fp32 tolerance.
    """
    m = _sym(m.astype(jnp.float32)) + jitter * jnp.eye(4, dtype=jnp.float32)
    a = m[..., :2, :2]
    b = m[..., :2, 2:]
    d = m[..., 2:, 2:]
    a_inv = _inv2x2(a)
    a_inv_b = a_inv @ b  # [..., 2, 2]
    s = d - jnp.swapaxes(b, -1, -2) @ a_inv_b  # Schur complement
    s_inv = _inv2x2(s)
    top_right = -(a_inv_b @ s_inv)
    top_left = a_inv + a_inv_b @ s_inv @ jnp.swapaxes(a_inv_b, -1, -2)
    bottom_left = jnp.swapaxes(top_right, -1, -2)
    inv = jnp.concatenate(
        [
            jnp.concatenate([top_left, top_right], axis=-1),
            jnp.concatenate([bottom_left, s_inv], axis=-1),
        ],
        axis=-2,
    )
    return _sym(inv)


def category_prior_from_frequencies(
    class_counts, background_weight: float = 1.0, eps: float = 1e-6
):
    """Informative category prior from training-set class frequencies
    (paper §III.C: replacing the non-informative prior with dataset
    statistics sharpens fused posteriors toward prevalent classes).

    class_counts: [C] foreground occurrence counts (or frequencies).
    Returns [C+1] log-probabilities (pass as BayesConfig.category_prior /
    fuse_clusters prior_logits under "likelihood" fusion; exponentiate and
    scale for "dirichlet" concentration offsets).
    """
    counts = jnp.asarray(class_counts, jnp.float32)
    full = jnp.concatenate([jnp.asarray([background_weight]), counts])
    p = jnp.maximum(full, eps) / jnp.sum(jnp.maximum(full, eps))
    return jnp.log(p)


def fuse_clusters(
    clusters: Clusters,
    boxes: jnp.ndarray,
    covs: jnp.ndarray,
    probs: jnp.ndarray,
    cov_jitter: float = 1e-3,
    prior_logits: Optional[jnp.ndarray] = None,
    category_fusion: str = "likelihood",
    box_fusion_prior: str = "measurement",
    eps: float = 1e-12,
) -> FusedDetections:
    """Fuse per-anchor posteriors into per-cluster detections.

    Args:
      clusters: membership [D, K] (+ validity) from iou_affinity_clustering.
                For greedy-NMS membership rows hold only the center, in which
                case fusion reduces to identity on the center's posterior.
      boxes: [K, 4] per-candidate mean boxes (corner space, fp32).
      covs:  [K, 4, 4] per-candidate total covariances.
      probs: [K, C+1] per-candidate mean categoricals (background = class 0).
      prior_logits: optional [C+1] informative category prior (log space for
                "likelihood"; concentration offsets for "dirichlet");
                None = uniform / unit prior (non-informative, the default).
      category_fusion: "likelihood" — members are independent categorical
                likelihoods of one label, fused by multiplication (softmax of
                summed logs; paper §III.C conjugate update); "dirichlet" —
                each member contributes its categorical as Dirichlet
                pseudo-counts, fused alpha = 1 + sum_i p_i, output is the
                Dirichlet mean (softer; heavier members -> sharper).
      box_fusion_prior: "measurement" — every member (center included) is
                an independent measurement, Lambda_f = sum_i Lambda_i
                (the round-1 behavior); "center" — the paper §III.B
                formulation: the cluster CENTER's per-anchor posterior is the
                Gaussian PRIOR and the remaining members are measurement
                updates, Lambda_f = Lambda_center + sum_{i != center}
                Lambda_i. Because membership always contains the center
                exactly once, the two are ALGEBRAICALLY IDENTICAL — the
                option exists to pin that equivalence explicitly (tested in
                tests/test_bayes.py) and to keep the prior term separable
                for variants that reweight it.
    """
    m = clusters.membership.astype(jnp.float32)  # [D, K]

    # --- Gaussian fusion ----------------------------------------------------
    precisions = inv4x4_psd(covs, jitter=cov_jitter)  # [K, 4, 4]
    eta = jnp.einsum("kij,kj->ki", precisions, boxes.astype(jnp.float32))
    if box_fusion_prior == "center":
        # Prior = center posterior; measurements = members minus the center.
        center_onehot = jax.nn.one_hot(
            clusters.centers, m.shape[-1], dtype=jnp.float32
        ) * clusters.valid[:, None].astype(jnp.float32)
        m_meas = jnp.maximum(m - center_onehot, 0.0)
        lam_f = jnp.einsum("dk,kij->dij", center_onehot + m_meas, precisions)
        eta_f = jnp.einsum("dk,ki->di", center_onehot + m_meas, eta)
    elif box_fusion_prior == "measurement":
        lam_f = jnp.einsum("dk,kij->dij", m, precisions)  # [D, 4, 4]
        eta_f = jnp.einsum("dk,ki->di", m, eta)  # [D, 4]
    else:
        raise ValueError(f"unknown box_fusion_prior '{box_fusion_prior}'")
    # Empty clusters have Lambda_f = 0; the jitter keeps the solve finite and
    # `valid` masks them out downstream.
    sigma_f = inv4x4_psd(lam_f, jitter=cov_jitter)
    mu_f = jnp.einsum("dij,dj->di", sigma_f, eta_f)

    # --- Dirichlet/categorical fusion ----------------------------------------
    if category_fusion == "likelihood":
        logp = jnp.log(jnp.maximum(probs.astype(jnp.float32), eps))  # [K, C+1]
        fused_logits = jnp.einsum("dk,kc->dc", m, logp)
        if prior_logits is not None:
            fused_logits = fused_logits + prior_logits[None, :].astype(
                jnp.float32
            )
        p_f = jax.nn.softmax(fused_logits, axis=-1)
    elif category_fusion == "dirichlet":
        counts = jnp.einsum("dk,kc->dc", m, probs.astype(jnp.float32))
        alpha = 1.0 + counts  # unit (non-informative) prior concentration
        if prior_logits is not None:
            alpha = alpha + prior_logits[None, :].astype(jnp.float32)
        p_f = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
    else:
        raise ValueError(f"unknown category_fusion '{category_fusion}'")

    scores = jnp.max(p_f[:, 1:], axis=-1)
    entropy = -jnp.sum(p_f * jnp.log(jnp.maximum(p_f, eps)), axis=-1)
    valid = clusters.valid & (jnp.sum(m, axis=-1) > 0)
    return FusedDetections(
        boxes=mu_f, covs=sigma_f, probs=p_f,
        scores=jnp.where(valid, scores, 0.0),
        entropy=entropy, valid=valid,
    )


def fuse_clusters_mean(
    clusters: Clusters,
    boxes: jnp.ndarray,
    covs: jnp.ndarray,
    probs: jnp.ndarray,
    eps: float = 1e-12,
) -> FusedDetections:
    """EMPIRICAL-moment fusion — the paper's non-Bayesian comparison
    estimators (arXiv:1903.03838 §IV: "Black Box" over MC-sampled outputs,
    "Anchor Redundancy" over single-pass anchor outputs; SURVEY.md §2
    "Baseline post-processing modes"). Per cluster, members are pooled as an
    equally-weighted Gaussian mixture and the output is that mixture's mean
    and covariance:

      mu_f    = (1/n) sum_i mu_i
      Sigma_f = (1/n) sum_i (Sigma_i + mu_i mu_i^T) - mu_f mu_f^T
      p_f     = (1/n) sum_i p_i

    Unlike the conjugate update in `fuse_clusters`, MORE agreeing members do
    not shrink the covariance — the spread of member means adds to it. That
    contrast is the paper's headline comparison (BayesOD's precision-weighted
    fusion vs averaging).
    """
    m = clusters.membership.astype(jnp.float32)  # [D, K]
    n = jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)  # [D, 1]
    w = m / n  # equal member weights
    b = boxes.astype(jnp.float32)
    mu_f = jnp.einsum("dk,ki->di", w, b)  # [D, 4]
    second = covs.astype(jnp.float32) + jnp.einsum("ki,kj->kij", b, b)
    e_second = jnp.einsum("dk,kij->dij", w, second)
    sigma_f = _sym(e_second - jnp.einsum("di,dj->dij", mu_f, mu_f))
    p_f = jnp.einsum("dk,kc->dc", w, probs.astype(jnp.float32))
    p_f = p_f / jnp.maximum(jnp.sum(p_f, axis=-1, keepdims=True), eps)

    scores = jnp.max(p_f[:, 1:], axis=-1)
    entropy = -jnp.sum(p_f * jnp.log(jnp.maximum(p_f, eps)), axis=-1)
    valid = clusters.valid & (jnp.sum(m, axis=-1) > 0)
    return FusedDetections(
        boxes=mu_f, covs=sigma_f, probs=p_f,
        scores=jnp.where(valid, scores, 0.0),
        entropy=entropy, valid=valid,
    )
