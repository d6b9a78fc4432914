"""Tests for visualization and profiling utilities."""

import numpy as np

from bayesod_tpu.data.synthetic import SyntheticDataset
from bayesod_tpu.utils.visualize import draw_detections, save_detection_grid


def test_draw_detections_returns_image():
    img = np.zeros((64, 96, 3), np.uint8)
    boxes = np.array([[10, 10, 40, 40], [50, 20, 90, 60]], np.float32)
    classes = np.array([1, 2], np.int32)
    scores = np.array([0.9, 0.8], np.float32)
    covs = np.stack([np.eye(4) * 4.0] * 2)
    out = draw_detections(
        img, boxes, classes, scores, covs, class_names=["a", "b"],
        score_threshold=0.5,
    )
    arr = np.asarray(out)
    assert arr.shape == (64, 96, 3)
    assert arr.sum() > 0  # something was drawn


def test_draw_respects_threshold():
    img = np.zeros((32, 32, 3), np.uint8)
    out = draw_detections(
        img,
        np.array([[5, 5, 25, 25]], np.float32),
        np.array([1], np.int32),
        np.array([0.1], np.float32),
        score_threshold=0.5,
    )
    assert np.asarray(out).sum() == 0  # below threshold: nothing drawn


def test_save_detection_grid(tmp_path):
    ds = SyntheticDataset(size=2, image_hw=(64, 64))
    records = []
    for i in range(2):
        records.append(
            {
                "boxes": [[8, 8, 30, 30]],
                "covs": [np.eye(4).tolist()],
                "probs": [[0.1, 0.7, 0.1, 0.1]],
                "scores": [0.7],
                "entropy": [0.9],
                "classes": [1],
            }
        )
    p = save_detection_grid(records, ds, str(tmp_path / "grid.png"))
    from PIL import Image

    img = Image.open(p)
    assert img.size == (128, 64)


def test_timed_steady_state_runs():
    import jax.numpy as jnp

    from bayesod_tpu.utils.profiling import timed_steady_state

    import jax

    f = jax.jit(lambda x: x * 2 + 1)
    stats = timed_steady_state(f, lambda i: (jnp.float32(i),), iters=3, warmup=1)
    assert stats["p50_s"] >= 0 and np.isfinite(stats["mean_s"])
