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


@pytest.mark.parametrize("bsz", [1, 3, 8, 11])
def test_batched_kernel_matches_single(bsz):
    """Batch-blocked kernel == vmapped single-image kernel, bit-for-bit
    (incl. a batch that is not a multiple of the image block)."""
    from bayesod_tpu.ops.pallas.clustering import (
        iou_affinity_clustering_pallas_batched,
    )

    key = jax.random.PRNGKey(7)
    k, d = 64, 16
    boxes = jnp.stack(
        [random_boxes(jax.random.fold_in(key, i), k) for i in range(bsz)]
    )
    scores = jax.random.uniform(jax.random.fold_in(key, 100), (bsz, k))
    valid = jax.random.uniform(jax.random.fold_in(key, 200), (bsz, k)) > 0.2

    ref = jax.vmap(
        lambda b, s, v: iou_affinity_clustering_pallas(
            b, s, v, 0.5, d, interpret=True
        )
    )(boxes, scores, valid)
    got = iou_affinity_clustering_pallas_batched(
        boxes, scores, valid, 0.5, d, interpret=True
    )
    np.testing.assert_array_equal(np.array(ref.valid), np.array(got.valid))
    np.testing.assert_array_equal(
        np.array(ref.centers) * np.array(ref.valid),
        np.array(got.centers) * np.array(got.valid),
    )
    np.testing.assert_array_equal(
        np.array(ref.membership), np.array(got.membership)
    )


def test_auto_wrapper_routes_vmap_to_batched():
    """The custom-vmap cluster_fn: unbatched == single kernel; under
    jax.vmap == the blocked kernel; nested vmap flattens correctly."""
    from bayesod_tpu.ops.pallas.clustering import (
        iou_affinity_clustering_pallas_auto,
    )

    key = jax.random.PRNGKey(11)
    k, d = 32, 8
    boxes = jnp.stack(
        [
            jnp.stack(
                [random_boxes(jax.random.fold_in(key, 10 * i + j), k)
                 for j in range(2)]
            )
            for i in range(3)
        ]
    )  # [3, 2, K, 4]
    scores = jax.random.uniform(jax.random.fold_in(key, 1), (3, 2, k))
    valid = jnp.ones((3, 2, k), bool)

    fn = lambda b, s, v: iou_affinity_clustering_pallas_auto(
        b, s, v, 0.5, d, interpret=True
    )
    one = fn(boxes[0, 0], scores[0, 0], valid[0, 0])
    ref = iou_affinity_clustering_pallas(
        boxes[0, 0], scores[0, 0], valid[0, 0], 0.5, d, interpret=True
    )
    np.testing.assert_array_equal(np.array(one.membership), np.array(ref.membership))

    nested = jax.vmap(jax.vmap(fn))(boxes, scores, valid)
    flat_ref = jax.vmap(
        lambda b, s, v: iou_affinity_clustering_pallas(
            b, s, v, 0.5, d, interpret=True
        )
    )(boxes.reshape(-1, k, 4), scores.reshape(-1, k), valid.reshape(-1, k))
    np.testing.assert_array_equal(
        np.array(nested.membership).reshape(-1, d, k),
        np.array(flat_ref.membership),
    )
    np.testing.assert_array_equal(
        np.array(nested.valid).reshape(-1, d), np.array(flat_ref.valid)
    )


@pytest.mark.slow
def test_detector_pallas_clustering_backend_matches_xla():
    """End-to-end detect() with clustering_backend='pallas' (the batched
    custom-vmap route, interpreted on CPU) == clustering_backend='xla'."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    from bayesod_tpu.infer import jit_detect_fn
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    cfg = ExperimentConfig(
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=32,
            head_depth=1, head_channels=32, norm="groupnorm",
            compute_dtype="float32",
        ),
        bayes=BayesConfig(
            num_mc_samples=4, score_threshold=0.0, pre_cluster_topk=64,
            max_detections=10, clustering_backend="xla",
        ),
        data=DataConfig(image_hw=(128, 128)),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    v = init_variables(model, jax.random.PRNGKey(0), cfg.data.image_hw)
    images = jax.random.uniform(jax.random.PRNGKey(2), (3, 128, 128, 3))
    rng = jax.random.PRNGKey(1)

    ref = jit_detect_fn(cfg, model)(v, images, rng)
    cfg_p = dataclasses.replace(
        cfg, bayes=dataclasses.replace(cfg.bayes, clustering_backend="pallas")
    )
    with pltpu.force_tpu_interpret_mode():
        got = jit_detect_fn(cfg_p, model)(v, images, rng)
    np.testing.assert_array_equal(np.array(ref.valid), np.array(got.valid))
    np.testing.assert_allclose(
        np.array(ref.boxes), np.array(got.boxes), atol=1e-5
    )
    np.testing.assert_allclose(
        np.array(ref.probs), np.array(got.probs), atol=1e-6
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
