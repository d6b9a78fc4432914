"""Unit tests for box geometry: conversions, IoU, encode/decode, covariance.

Strategy per SURVEY.md §4: the reference ships no tests, so every math
component gets hand-computed / analytic oracles here. The covariance decode is
additionally checked against a finite-difference Jacobian and a Monte-Carlo
push-forward — the two failure modes (wrong Jacobian, wrong corner transform)
are caught independently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.ops import boxes as B


def test_centroid_corner_roundtrip():
    rng = np.random.RandomState(0)
    c = np.stack(
        [
            rng.uniform(0, 100, 64),
            rng.uniform(0, 100, 64),
            rng.uniform(1, 50, 64),
            rng.uniform(1, 50, 64),
        ],
        axis=-1,
    ).astype(np.float32)
    out = np.asarray(B.corners_to_centroid(B.centroid_to_corners(jnp.asarray(c))))
    np.testing.assert_allclose(out, c, rtol=1e-5, atol=1e-4)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array(
        [
            [0.0, 0.0, 10.0, 10.0],  # identical -> 1
            [5.0, 5.0, 15.0, 15.0],  # quarter overlap -> 25/175
            [20.0, 20.0, 30.0, 30.0],  # disjoint -> 0
            [0.0, 0.0, 5.0, 10.0],  # contained half -> 50/100
        ]
    )
    iou = np.asarray(B.pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25.0 / 175.0, 0.0, 0.5], atol=1e-6)


def test_iou_symmetry_and_degenerate():
    rng = np.random.RandomState(1)
    x1y1 = rng.uniform(0, 50, (20, 2))
    wh = rng.uniform(1, 30, (20, 2))
    a = jnp.asarray(np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32))
    iou_ab = np.asarray(B.pairwise_iou(a, a))
    np.testing.assert_allclose(iou_ab, iou_ab.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(iou_ab), 1.0, atol=1e-6)
    # zero-area box: no NaNs, IoU 0 against disjoint box
    z = jnp.array([[5.0, 5.0, 5.0, 5.0]])
    far = jnp.array([[50.0, 50.0, 60.0, 60.0]])
    assert np.asarray(B.pairwise_iou(z, far))[0, 0] == 0.0
    assert not np.any(np.isnan(np.asarray(B.pairwise_iou(z, z))))


@pytest.mark.parametrize("scales", [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)])
def test_encode_decode_roundtrip(scales):
    rng = np.random.RandomState(2)
    anchors = np.concatenate(
        [rng.uniform(0, 200, (128, 2)), rng.uniform(8, 64, (128, 2))], -1
    ).astype(np.float32)
    anchors = np.asarray(B.centroid_to_corners(jnp.asarray(anchors)))
    gt = np.concatenate(
        [rng.uniform(0, 200, (128, 2)), rng.uniform(4, 80, (128, 2))], -1
    ).astype(np.float32)
    gt = np.asarray(B.centroid_to_corners(jnp.asarray(gt)))
    deltas = B.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors), scales)
    back = np.asarray(B.decode_boxes(deltas, jnp.asarray(anchors), scales))
    np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-2)


def test_decode_zero_deltas_returns_anchor():
    anchors = jnp.array([[10.0, 20.0, 50.0, 80.0]])
    out = np.asarray(B.decode_boxes(jnp.zeros((1, 4)), anchors))
    np.testing.assert_allclose(out, np.asarray(anchors), atol=1e-5)


def test_decode_jacobian_matches_finite_differences():
    anchors = jnp.array([[10.0, 20.0, 50.0, 80.0], [0.0, 0.0, 32.0, 32.0]])
    deltas = jnp.array([[0.1, -0.2, 0.3, 0.05], [-0.4, 0.2, -0.1, 0.6]])

    def decode_centroid(d):
        return B.corners_to_centroid(B.decode_boxes(d, anchors))

    jac = jax.jacfwd(decode_centroid)(deltas)  # [N,4,N,4]
    analytic = np.asarray(B.decode_jacobian_diag(deltas, anchors))
    for n in range(2):
        full = np.asarray(jac[n, :, n, :])
        np.testing.assert_allclose(np.diag(full), analytic[n], rtol=1e-4)
        # decode is elementwise in the deltas -> off-diagonal must vanish
        np.testing.assert_allclose(full - np.diag(np.diag(full)), 0.0, atol=1e-5)


def test_decode_covariance_matches_monte_carlo_pushforward():
    """Sample encoded-space noise, decode, compare empirical corner covariance
    against the analytic (delta-method) decode_covariance."""
    rng = np.random.RandomState(3)
    anchor = jnp.array([[100.0, 100.0, 164.0, 148.0]])
    delta = jnp.array([[0.05, -0.1, 0.1, 0.2]])
    log_var = jnp.array([[-6.0, -5.5, -7.0, -6.5]])  # small vars -> linear regime

    sigma = np.asarray(B.decode_covariance(log_var, delta, anchor))[0]

    std = np.exp(0.5 * np.asarray(log_var))[0]
    samples = np.asarray(delta)[0] + rng.randn(200000, 4) * std
    decoded = np.asarray(B.decode_boxes(jnp.asarray(samples, jnp.float32), anchor))
    emp = np.cov(decoded.T)
    # x<->y cross terms are analytically exactly 0 (diagonal encoded cov);
    # the empirical estimate carries O(1/sqrt(n)) noise there, hence the atol.
    np.testing.assert_allclose(sigma, emp, rtol=0.05, atol=0.05)
    # symmetry + PSD
    np.testing.assert_allclose(sigma, sigma.T, atol=1e-8)
    assert np.all(np.linalg.eigvalsh(sigma) > 0)


def test_clip_boxes():
    bx = jnp.array([[-5.0, -5.0, 500.0, 500.0]])
    out = np.asarray(B.clip_boxes(bx, (100, 200)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 200.0, 100.0]])
