"""Probabilistic detection metrics: MUE, Gaussian NLL, entropy statistics.

Rebuild of the reference's uncertainty evaluation (SURVEY.md §2 "Evaluator",
§3.3; arXiv:1903.03838 §IV):

  * Minimum Uncertainty Error (MUE): detections are labelled correct (TP) or
    incorrect (FP) by IoU-with-GT; an uncertainty measure u should separate
    the two. MUE = min over thresholds t of
        0.5 * (P[u > t | correct] + P[u <= t | incorrect])
    i.e. the best achievable balanced error of "flag high-uncertainty as
    wrong". 0.5 = uninformative, 0 = perfect separation.
  * Gaussian NLL: -log N(gt_box | mu, Sigma) averaged over TPs — evaluates
    the full 4x4 corner covariance BayesOD outputs.
  * Categorical NLL and entropy summaries over TPs/FPs.

Host-side NumPy over dumped detections, like the reference's offline eval.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

_LOG_2PI = float(np.log(2.0 * np.pi))


def minimum_uncertainty_error(
    uncertainty: np.ndarray, correct: np.ndarray
) -> Tuple[float, float]:
    """(MUE, best threshold). Low uncertainty should predict `correct`."""
    u = np.asarray(uncertainty, np.float64)
    c = np.asarray(correct, bool)
    if len(u) == 0 or c.all() or (~c).all():
        return 0.5, float("nan")
    # Vectorized sweep: sort by u; threshold after position j flags items
    # j+1.. as incorrect. err(j) = 0.5*(#correct above j / n_c +
    # #incorrect at-or-below j / n_i), computed with cumulative sums in
    # O(N log N) (the reference-era loop was O(N^2) on large val splits).
    order = np.argsort(u, kind="stable")
    u_sorted = u[order]
    c_sorted = c[order].astype(np.float64)
    n_c = c_sorted.sum()
    n_i = len(c_sorted) - n_c
    # After cutting at j items kept (j = 0..N), with ties kept together.
    cum_c = np.concatenate([[0.0], np.cumsum(c_sorted)])  # correct kept
    cum_i = np.concatenate([[0.0], np.cumsum(1.0 - c_sorted)])
    fn_rate = (n_c - cum_c) / n_c  # correct flagged as wrong
    fp_rate = cum_i / n_i  # incorrect kept
    err = 0.5 * (fn_rate + fp_rate)
    # Valid cut points: only between distinct u values (ties inseparable).
    boundary = np.concatenate(
        [[True], u_sorted[1:] != u_sorted[:-1], [True]]
    )
    err = np.where(boundary, err, np.inf)
    j = int(np.argmin(err))
    if j == 0:
        t = float(u_sorted[0] - 1.0)
    elif j == len(u_sorted):
        t = float(u_sorted[-1] + 1.0)
    else:
        t = float(0.5 * (u_sorted[j - 1] + u_sorted[j]))
    return float(err[j]), t


def psd_project(cov: np.ndarray, floor: float = 1e-3) -> np.ndarray:
    """Nearest-PSD repair for per-detection 4x4 covariances, [N, 4, 4].

    Evaluation must not die on one degenerate matrix: a bf16 serving graph
    can emit a borderline cluster whose fused covariance has a slightly
    negative eigenvalue (or non-finite entries after an extreme precision
    sum), and np.linalg.cholesky raises on the whole batch. Symmetrize,
    replace non-finite rows with a huge isotropic covariance (maximally
    uncertain — the honest reading of a broken posterior), and floor the
    eigenvalues."""
    cov = np.asarray(cov, np.float64)
    if cov.size == 0:  # zero detections: nothing to repair
        return cov
    bad = ~np.isfinite(cov).all(axis=(-2, -1))
    if bad.any():
        cov = cov.copy()
        cov[bad] = 1e8 * np.eye(4)
    cov = 0.5 * (cov + cov.swapaxes(-1, -2))
    w, v = np.linalg.eigh(cov)
    if w.min() >= floor:
        return cov
    w = np.maximum(w, floor)
    return np.einsum("...ij,...j,...kj->...ik", v, w, v)


def gaussian_nll(
    gt_boxes: np.ndarray, mu: np.ndarray, cov: np.ndarray, jitter: float = 1e-3
) -> np.ndarray:
    """Per-detection -log N(gt | mu, Sigma), full 4x4 covariance. [N]"""
    if len(gt_boxes) == 0:
        return np.zeros(0)
    cov = psd_project(cov, floor=jitter)
    err = (gt_boxes - mu)[..., None]  # [N, 4, 1]
    chol = np.linalg.cholesky(cov)
    sol = np.linalg.solve(chol, err)  # [N, 4, 1]
    maha = np.sum(sol[..., 0] ** 2, axis=-1)
    logdet = 2.0 * np.sum(np.log(np.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)
    return 0.5 * (maha + logdet + 4.0 * _LOG_2PI)


def categorical_nll(probs: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Per-detection -log p(label). probs [N, C+1], labels [N] int."""
    if len(labels) == 0:
        return np.zeros(0)
    p = probs[np.arange(len(labels)), labels]
    return -np.log(np.maximum(p, 1e-12))


def entropy(probs: np.ndarray) -> np.ndarray:
    """Categorical entropy in nats, [N]."""
    p = np.clip(probs, 1e-12, 1.0)
    return -np.sum(p * np.log(p), axis=-1)


def gaussian_entropy(cov: np.ndarray, jitter: float = 1e-3) -> np.ndarray:
    """Differential entropy of N(mu, Sigma), [N] (paper's box-uncertainty
    ranking measure): 0.5 * log((2 pi e)^4 |Sigma|)."""
    cov = psd_project(cov, floor=jitter)
    sign, logdet = np.linalg.slogdet(cov)
    return 0.5 * (4.0 * (_LOG_2PI + 1.0) + logdet)


def expected_calibration_error(
    confidence: np.ndarray, correct: np.ndarray, num_bins: int = 10
) -> float:
    """Detection-score ECE: |accuracy - mean confidence| averaged over
    equal-width confidence bins, weighted by bin occupancy. 0 = perfectly
    calibrated scores. Complements MUE (separability) with calibration —
    BayesOD's fused posteriors should be better calibrated than raw scores
    (paper §IV discussion)."""
    conf = np.asarray(confidence, np.float64)
    c = np.asarray(correct, bool)
    if len(conf) == 0:
        return 0.0
    edges = np.linspace(0.0, 1.0, num_bins + 1)
    ece = 0.0
    for i in range(num_bins):
        lo, hi = edges[i], edges[i + 1]
        mask = (conf >= lo) & (conf < hi if i < num_bins - 1 else conf <= hi)
        if not mask.any():
            continue
        ece += (mask.mean()) * abs(c[mask].mean() - conf[mask].mean())
    return float(ece)


def uncertainty_report(
    correct: np.ndarray,
    probs: np.ndarray,
    covs: np.ndarray,
    matched_gt_boxes: Optional[np.ndarray] = None,
    matched_gt_labels: Optional[np.ndarray] = None,
    mu: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Aggregate uncertainty metrics over a split's matched detections.

    correct: [N] bool TP/FP labels for all kept detections.
    probs/covs/mu: [N, ...] per-detection posteriors.
    matched_gt_*: GT for the TP subset ordering of `correct` (rows where
      correct is False are ignored for NLL).
    """
    ent = entropy(probs)
    gent = gaussian_entropy(covs)
    cat_mue, _ = minimum_uncertainty_error(ent, correct)
    gauss_mue, _ = minimum_uncertainty_error(gent, correct)
    out = {
        "categorical_mue": cat_mue,
        "gaussian_mue": gauss_mue,
        "mean_entropy_tp": float(ent[correct].mean()) if correct.any() else 0.0,
        "mean_entropy_fp": (
            float(ent[~correct].mean()) if (~correct).any() else 0.0
        ),
        "ece": expected_calibration_error(
            np.max(probs[:, 1:], axis=-1), correct
        ),
    }
    # Post-hoc temperature: what the split's calibration COULD be.
    # Detector.with_temperature(T) (default where="output", i.e.
    # bayes.output_temperature) reproduces ece_calibrated EXACTLY at
    # serving — it tempers the same fused categoricals this report sees.
    t_fit = fit_temperature(probs, correct)
    out["temperature_fit"] = t_fit
    out["ece_calibrated"] = expected_calibration_error(
        np.max(apply_temperature(probs, t_fit)[:, 1:], axis=-1), correct
    )
    if matched_gt_boxes is not None and mu is not None and correct.any():
        tp = correct
        out["gaussian_nll"] = float(
            gaussian_nll(matched_gt_boxes[tp], mu[tp], covs[tp]).mean()
        )
    if matched_gt_labels is not None and correct.any():
        out["categorical_nll"] = float(
            categorical_nll(probs[correct], matched_gt_labels[correct]).mean()
        )
    return out


def fit_temperature(
    probs: np.ndarray,
    correct: np.ndarray,
    t_range: Tuple[float, float] = (0.05, 20.0),
    iters: int = 60,
    eps: float = 1e-12,
) -> float:
    """Post-hoc temperature for the categorical posteriors (Guo et al. 2017
    adapted to detection): find T minimizing the binary NLL of the
    max-foreground confidence under softmax(log p / T) against TP/FP labels.

    Works on PROBS (log p recovers logits up to a per-row constant, which
    temperature scaling is invariant to). Golden-section search on log T —
    the objective is smooth and unimodal in practice. Apply the fitted T at
    serving with Detector.with_temperature(T) (scales the cls final conv,
    so every execution path — fused kernels included — emits logits/T).
    """
    p = np.clip(np.asarray(probs, np.float64), eps, 1.0)
    c = np.asarray(correct, bool)
    if len(p) == 0 or c.all() or not c.any():
        # Degenerate labels (all-TP or all-FP): the binary NLL is minimized
        # at a search bound (maximal sharpening/flattening) — a pathological
        # serving temperature. Mirror minimum_uncertainty_error's guard and
        # report the identity instead.
        return 1.0
    logp = np.log(p)

    def nll(t):
        z = logp / t
        z = z - z.max(axis=-1, keepdims=True)
        q = np.exp(z)
        q /= q.sum(axis=-1, keepdims=True)
        conf = np.clip(q[:, 1:].max(axis=-1), eps, 1.0 - eps)
        return float(-np.mean(np.where(c, np.log(conf), np.log1p(-conf))))

    lo, hi = np.log(t_range[0]), np.log(t_range[1])
    phi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    x1 = b - phi * (b - a)
    x2 = a + phi * (b - a)
    f1, f2 = nll(np.exp(x1)), nll(np.exp(x2))
    for _ in range(iters):
        if f1 <= f2:
            b, x2, f2 = x2, x1, f1
            x1 = b - phi * (b - a)
            f1 = nll(np.exp(x1))
        else:
            a, x1, f1 = x1, x2, f2
            x2 = a + phi * (b - a)
            f2 = nll(np.exp(x2))
    return float(np.exp((a + b) / 2.0))


def apply_temperature(probs: np.ndarray, t: float, eps: float = 1e-12):
    """softmax(log p / T) row-wise (numpy; the offline mirror of serving)."""
    z = np.log(np.clip(np.asarray(probs, np.float64), eps, 1.0)) / t
    z -= z.max(axis=-1, keepdims=True)
    q = np.exp(z)
    return q / q.sum(axis=-1, keepdims=True)
