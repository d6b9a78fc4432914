"""Analytic-oracle tests for MC moments, clustering, and Bayesian fusion.

Per SURVEY.md §4: Gaussian fusion is checked against the closed-form
two-measurement posterior, Dirichlet fusion against direct likelihood
multiplication, clustering against a hand-worked greedy trace, and moments
against NumPy reference computations.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bayesod_tpu.bayes import (
    fuse_clusters,
    greedy_nms,
    inv4x4_psd,
    iou_affinity_clustering,
    mc_box_moments,
    mean_categorical,
)
from bayesod_tpu.bayes.clustering import Clusters
from bayesod_tpu.ops import boxes as box_ops


# ---------------------------------------------------------------- moments ---


def test_mc_box_moments_against_numpy():
    rng = np.random.RandomState(0)
    n, k = 8, 16
    anchors_c = np.concatenate(
        [rng.uniform(50, 150, (k, 2)), rng.uniform(16, 64, (k, 2))], -1
    ).astype(np.float32)
    anchors = np.asarray(box_ops.centroid_to_corners(jnp.asarray(anchors_c)))
    deltas = rng.randn(n, k, 4).astype(np.float32) * 0.1
    log_vars = rng.randn(n, k, 4).astype(np.float32) - 5.0

    mean_boxes, cov = mc_box_moments(
        jnp.asarray(deltas), jnp.asarray(log_vars), jnp.asarray(anchors)
    )
    decoded = np.asarray(
        box_ops.decode_boxes(jnp.asarray(deltas), jnp.asarray(anchors)[None])
    )
    np.testing.assert_allclose(
        np.asarray(mean_boxes), decoded.mean(0), rtol=1e-5, atol=1e-3
    )
    # epistemic part alone for anchor 0 (1/N normalizer)
    emp = np.zeros((4, 4))
    c = decoded[:, 0] - decoded[:, 0].mean(0)
    emp = c.T @ c / n
    alea = np.asarray(
        box_ops.decode_covariance(
            jnp.asarray(log_vars), jnp.asarray(deltas), jnp.asarray(anchors)[None]
        )
    ).mean(0)[0]
    np.testing.assert_allclose(np.asarray(cov[0]), emp + alea, rtol=1e-4, atol=1e-3)


def test_mean_categorical():
    logits = jnp.asarray(np.random.RandomState(1).randn(5, 7, 4), jnp.float32)
    out = np.asarray(mean_categorical(logits))
    ref = np.asarray(jax.nn.softmax(logits, axis=-1)).mean(0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


# ------------------------------------------------------------- clustering ---


def _boxes_scores():
    # box 0 and 1 overlap heavily; 2 overlaps 0 weakly; 3 is far away.
    boxes = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [1.0, 1.0, 11.0, 11.0],
            [6.0, 6.0, 16.0, 16.0],
            [50.0, 50.0, 60.0, 60.0],
        ]
    )
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    return boxes, scores


def test_iou_affinity_clustering_greedy_trace():
    boxes, scores = _boxes_scores()
    cl = iou_affinity_clustering(
        boxes, scores, jnp.ones(4, bool), affinity_threshold=0.5, max_detections=4
    )
    centers = np.asarray(cl.centers)
    members = np.asarray(cl.membership)
    valid = np.asarray(cl.valid)
    # greedy: center 0 absorbs 1 (IoU ~0.68); then 2; then 3; then nothing.
    assert centers[0] == 0 and valid[0]
    np.testing.assert_array_equal(members[0], [True, True, False, False])
    assert centers[1] == 2 and valid[1]
    np.testing.assert_array_equal(members[1], [False, False, True, False])
    assert centers[2] == 3 and valid[2]
    assert not valid[3]
    assert not members[3].any()


def test_clustering_respects_valid_mask_and_threshold():
    boxes, scores = _boxes_scores()
    mask = jnp.array([True, True, False, True])
    cl = iou_affinity_clustering(boxes, scores, mask, 0.5, 4)
    # candidate 2 can never appear in any cluster
    assert not np.asarray(cl.membership)[:, 2].any()
    # low affinity threshold merges 0,1,2 (IoU(0,2) = 16/184 ~ 0.087)
    cl2 = iou_affinity_clustering(boxes, scores, jnp.ones(4, bool), 0.05, 4)
    np.testing.assert_array_equal(
        np.asarray(cl2.membership)[0], [True, True, True, False]
    )


def test_greedy_nms_keeps_only_centers():
    boxes, scores = _boxes_scores()
    cl = greedy_nms(boxes, scores, jnp.ones(4, bool), 0.5, 4)
    members = np.asarray(cl.membership)
    assert members.sum() == 3  # three clusters, one box each
    np.testing.assert_array_equal(members[0], [True, False, False, False])


def test_clustering_is_jittable():
    boxes, scores = _boxes_scores()
    fn = jax.jit(
        lambda b, s, m: iou_affinity_clustering(b, s, m, 0.5, 4).membership
    )
    out = np.asarray(fn(boxes, scores, jnp.ones(4, bool)))
    assert out.shape == (4, 4)


# ----------------------------------------------------------------- fusion ---


def test_inv4x4_psd():
    rng = np.random.RandomState(2)
    a = rng.randn(10, 4, 4).astype(np.float32)
    spd = a @ a.transpose(0, 2, 1) + 4.0 * np.eye(4, dtype=np.float32)
    inv = np.asarray(inv4x4_psd(jnp.asarray(spd)))
    np.testing.assert_allclose(
        inv @ spd, np.broadcast_to(np.eye(4), (10, 4, 4)), atol=1e-4
    )
    # Parity with a Cholesky-solve oracle (the pre-closed-form impl) in
    # fp64, including ill-conditioned covariances (tiny aleatoric vars on
    # one coordinate, like a confident near-degenerate box posterior).
    cond = spd.copy()
    cond[:, 0, 0] *= 1e-3
    cond = cond @ cond.transpose(0, 2, 1) + 1e-4 * np.eye(4, dtype=np.float32)
    for m in (spd, cond):
        oracle = np.linalg.inv(m.astype(np.float64))
        got = np.asarray(inv4x4_psd(jnp.asarray(m)))
        np.testing.assert_allclose(got, oracle, rtol=2e-3, atol=1e-4)


def test_gaussian_fusion_two_measurement_closed_form():
    """Two members in one cluster must give the textbook product-of-Gaussians
    posterior: Sigma = (S1^-1 + S2^-1)^-1, mu = Sigma (S1^-1 m1 + S2^-1 m2)."""
    m1 = np.array([10.0, 10.0, 20.0, 20.0], np.float32)
    m2 = np.array([12.0, 11.0, 22.0, 19.0], np.float32)
    s1 = np.diag([2.0, 1.0, 3.0, 2.0]).astype(np.float32)
    s2 = np.diag([1.0, 2.0, 1.0, 4.0]).astype(np.float32)
    jitter = 1e-6

    clusters = Clusters(
        centers=jnp.array([0, 0], jnp.int32),
        membership=jnp.array([[True, True], [False, False]]),
        valid=jnp.array([True, False]),
    )
    probs = jnp.array([[0.1, 0.6, 0.3], [0.2, 0.5, 0.3]], jnp.float32)
    out = fuse_clusters(
        clusters,
        jnp.asarray(np.stack([m1, m2])),
        jnp.asarray(np.stack([s1, s2])),
        probs,
        cov_jitter=jitter,
    )
    lam = np.linalg.inv(s1) + np.linalg.inv(s2)
    sigma_ref = np.linalg.inv(lam)
    mu_ref = sigma_ref @ (np.linalg.inv(s1) @ m1 + np.linalg.inv(s2) @ m2)
    np.testing.assert_allclose(np.asarray(out.boxes[0]), mu_ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.covs[0]), sigma_ref, rtol=1e-3, atol=1e-5)
    # fused covariance is tighter than either measurement
    assert np.all(np.diag(np.asarray(out.covs[0])) < np.diag(s1) + 1e-6)
    assert not bool(out.valid[1])


def test_categorical_fusion_multiplies_likelihoods():
    p1 = np.array([0.2, 0.5, 0.3], np.float32)
    p2 = np.array([0.1, 0.8, 0.1], np.float32)
    clusters = Clusters(
        centers=jnp.array([0], jnp.int32),
        membership=jnp.array([[True, True]]),
        valid=jnp.array([True]),
    )
    boxes = jnp.zeros((2, 4)) + jnp.array([0.0, 0.0, 10.0, 10.0])
    covs = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    out = fuse_clusters(clusters, boxes, covs, jnp.asarray(np.stack([p1, p2])))
    ref = p1 * p2
    ref = ref / ref.sum()
    np.testing.assert_allclose(np.asarray(out.probs[0]), ref, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scores[0]), ref[1:].max(), rtol=1e-4)
    ent_ref = -(ref * np.log(ref)).sum()
    np.testing.assert_allclose(np.asarray(out.entropy[0]), ent_ref, rtol=1e-4)


def test_single_member_fusion_is_identity():
    """NMS-style membership (center only) must return the center's posterior."""
    box = jnp.array([[5.0, 5.0, 25.0, 30.0]])
    cov = jnp.asarray(np.diag([2.0, 3.0, 1.5, 2.5])[None].astype(np.float32))
    probs = jnp.array([[0.3, 0.7]])
    clusters = Clusters(
        centers=jnp.array([0], jnp.int32),
        membership=jnp.array([[True]]),
        valid=jnp.array([True]),
    )
    out = fuse_clusters(clusters, box, cov, probs, cov_jitter=1e-6)
    np.testing.assert_allclose(np.asarray(out.boxes[0]), np.asarray(box[0]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out.covs[0]), np.asarray(cov[0]), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.probs[0]), [0.3, 0.7], rtol=1e-4)


def test_informative_prior_shifts_posterior():
    """prior_logits tilts likelihood fusion exactly like an extra member
    (paper §III.C: the prior multiplies into the categorical posterior)."""
    from bayesod_tpu.bayes import category_prior_from_frequencies

    p1 = np.array([0.2, 0.5, 0.3], np.float32)
    prior_p = np.array([0.1, 0.2, 0.7], np.float32)
    clusters = Clusters(
        centers=jnp.array([0], jnp.int32),
        membership=jnp.array([[True]]),
        valid=jnp.array([True]),
    )
    boxes = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    covs = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    out = fuse_clusters(
        clusters, boxes, covs, jnp.asarray(p1[None]),
        prior_logits=jnp.log(jnp.asarray(prior_p)),
    )
    ref = p1 * prior_p
    ref = ref / ref.sum()
    np.testing.assert_allclose(np.asarray(out.probs[0]), ref, rtol=1e-4)

    # Frequency helper: counts [30, 60] + bg weight 10 -> log [0.1, 0.3, 0.6].
    lp = np.asarray(
        category_prior_from_frequencies([30.0, 60.0], background_weight=10.0)
    )
    np.testing.assert_allclose(np.exp(lp), [0.1, 0.3, 0.6], rtol=1e-5)


def test_center_prior_fusion_closed_form_and_equivalence():
    """Paper §III.B center-as-prior option: posterior = N(prior) x N(meas)
    closed form, and algebraic identity with the measurement formulation
    (the center is exactly one member of its own cluster)."""
    m1 = np.array([10.0, 10.0, 20.0, 20.0], np.float32)  # center (prior)
    m2 = np.array([12.0, 11.0, 22.0, 19.0], np.float32)  # measurement
    s1 = np.diag([2.0, 1.0, 3.0, 2.0]).astype(np.float32)
    s2 = np.diag([1.0, 2.0, 1.0, 4.0]).astype(np.float32)
    clusters = Clusters(
        centers=jnp.array([0], jnp.int32),
        membership=jnp.array([[True, True]]),
        valid=jnp.array([True]),
    )
    probs = jnp.array([[0.1, 0.6, 0.3], [0.2, 0.5, 0.3]], jnp.float32)
    boxes = jnp.asarray(np.stack([m1, m2]))
    covs = jnp.asarray(np.stack([s1, s2]))
    got_c = fuse_clusters(
        clusters, boxes, covs, probs, cov_jitter=1e-6,
        box_fusion_prior="center",
    )
    # Closed form: Lambda = S1^-1 (prior) + S2^-1 (one measurement update).
    sigma_ref = np.linalg.inv(np.linalg.inv(s1) + np.linalg.inv(s2))
    mu_ref = sigma_ref @ (np.linalg.inv(s1) @ m1 + np.linalg.inv(s2) @ m2)
    np.testing.assert_allclose(np.asarray(got_c.boxes[0]), mu_ref, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_c.covs[0]), sigma_ref, rtol=1e-3, atol=1e-5
    )
    # Equivalence with the measurement formulation (bitwise-close).
    got_m = fuse_clusters(
        clusters, boxes, covs, probs, cov_jitter=1e-6,
        box_fusion_prior="measurement",
    )
    np.testing.assert_allclose(
        np.asarray(got_c.boxes), np.asarray(got_m.boxes), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_c.covs), np.asarray(got_m.covs), rtol=1e-6
    )


def test_mean_fusion_empirical_moments():
    """black_box / anchor_redundancy estimator: cluster output is the
    member mixture's mean and covariance (spread of means ADDS to the
    covariance, unlike the conjugate update which shrinks it)."""
    from bayesod_tpu.bayes.fusion import fuse_clusters_mean

    m1 = np.array([10.0, 10.0, 20.0, 20.0], np.float32)
    m2 = np.array([14.0, 12.0, 24.0, 18.0], np.float32)
    s1 = np.diag([2.0, 1.0, 3.0, 2.0]).astype(np.float32)
    s2 = np.diag([1.0, 2.0, 1.0, 4.0]).astype(np.float32)
    p1 = np.array([0.2, 0.5, 0.3], np.float32)
    p2 = np.array([0.1, 0.8, 0.1], np.float32)
    clusters = Clusters(
        centers=jnp.array([0, 1], jnp.int32),
        membership=jnp.array([[True, True], [False, True]]),
        valid=jnp.array([True, True]),
    )
    out = fuse_clusters_mean(
        clusters,
        jnp.asarray(np.stack([m1, m2])),
        jnp.asarray(np.stack([s1, s2])),
        jnp.asarray(np.stack([p1, p2])),
    )
    mu_ref = (m1 + m2) / 2
    outer = lambda v: np.outer(v, v)
    sigma_ref = (s1 + outer(m1) + s2 + outer(m2)) / 2 - outer(mu_ref)
    np.testing.assert_allclose(np.asarray(out.boxes[0]), mu_ref, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out.covs[0]), sigma_ref, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.probs[0]), (p1 + p2) / 2, rtol=1e-5
    )
    # Mean-spread term present: fused variance exceeds the member average.
    assert np.all(
        np.diag(np.asarray(out.covs[0])) > np.diag((s1 + s2) / 2) - 1e-5
    )
    # Singleton cluster = identity.
    np.testing.assert_allclose(np.asarray(out.boxes[1]), m2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.covs[1]), s2, rtol=1e-4, atol=1e-4)
