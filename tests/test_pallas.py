"""Pallas-kernel parity tests (interpret mode on CPU): kernels must match the
jnp reference implementations bit-for-bit in grouping decisions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.bayes.clustering import iou_affinity_clustering
from bayesod_tpu.ops.pallas.clustering import iou_affinity_clustering_pallas


def random_boxes(key, k, span=100.0):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (k, 2)) * span
    wh = jax.random.uniform(k2, (k, 2)) * 30.0 + 1.0
    return jnp.concatenate([xy, xy + wh], axis=-1)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
def test_pallas_matches_jnp(seed, threshold):
    key = jax.random.PRNGKey(seed)
    k, d = 64, 16
    boxes = random_boxes(key, k)
    scores = jax.random.uniform(jax.random.fold_in(key, 1), (k,))
    valid = jax.random.uniform(jax.random.fold_in(key, 2), (k,)) > 0.2

    ref = iou_affinity_clustering(boxes, scores, valid, threshold, d)
    got = iou_affinity_clustering_pallas(
        boxes, scores, valid, threshold, d, interpret=True
    )
    np.testing.assert_array_equal(np.array(ref.valid), np.array(got.valid))
    np.testing.assert_array_equal(
        np.array(ref.centers) * np.array(ref.valid),
        np.array(got.centers) * np.array(got.valid),
    )
    np.testing.assert_array_equal(
        np.array(ref.membership), np.array(got.membership)
    )


def test_pallas_no_valid_candidates():
    k, d = 32, 8
    boxes = random_boxes(jax.random.PRNGKey(0), k)
    scores = jnp.ones((k,))
    valid = jnp.zeros((k,), bool)
    got = iou_affinity_clustering_pallas(boxes, scores, valid, 0.5, d, interpret=True)
    assert not bool(jnp.any(got.valid))
    assert not bool(jnp.any(got.membership))


def test_pallas_single_candidate():
    k, d = 16, 4
    boxes = random_boxes(jax.random.PRNGKey(3), k)
    scores = jnp.ones((k,))
    valid = jnp.zeros((k,), bool).at[5].set(True)
    got = iou_affinity_clustering_pallas(boxes, scores, valid, 0.5, d, interpret=True)
    assert bool(got.valid[0]) and int(got.centers[0]) == 5
    assert int(jnp.sum(got.valid)) == 1
