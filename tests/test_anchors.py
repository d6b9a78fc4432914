"""Unit tests for the FPN anchor grid (SURVEY.md §2 "Anchor generator")."""

import numpy as np
import jax.numpy as jnp
import pytest

from bayesod_tpu.ops import boxes as B
from bayesod_tpu.ops.anchors import (
    AnchorConfig,
    feature_shapes,
    generate_anchors,
    level_anchor_counts,
)


def test_counts_and_shapes():
    cfg = AnchorConfig()
    hw = (256, 512)
    shapes = feature_shapes(hw, cfg)
    assert shapes == ((32, 64), (16, 32), (8, 16), (4, 8), (2, 4))
    counts = level_anchor_counts(hw, cfg)
    assert counts == tuple(h * w * 9 for h, w in shapes)
    anchors = generate_anchors(hw, cfg)
    assert anchors.shape == (sum(counts), 4)
    assert anchors.dtype == jnp.float32


def test_indivisible_shape_raises():
    with pytest.raises(ValueError):
        feature_shapes((100, 128), AnchorConfig())


def test_first_cell_anchor_geometry():
    """First anchor of P3: centered at (4, 4) (half-stride), 32x32 at ratio 0.5
    means w=sqrt(32^2/0.5), h=w*0.5 (area-preserving aspect ratios)."""
    cfg = AnchorConfig()
    a = np.asarray(generate_anchors((128, 128), cfg))
    c = np.asarray(B.corners_to_centroid(jnp.asarray(a)))
    # first cell, first octave scale, first ratio (0.5)
    np.testing.assert_allclose(c[0, :2], [4.0, 4.0], atol=1e-5)
    w = np.sqrt(32.0 ** 2 / 0.5)
    np.testing.assert_allclose(c[0, 2:], [w, w * 0.5], rtol=1e-6)
    # ratio 1.0 anchor is square with edge 32
    np.testing.assert_allclose(c[1, 2:], [32.0, 32.0], rtol=1e-6)


def test_anchor_centers_tile_with_stride():
    cfg = AnchorConfig()
    hw = (128, 256)
    a = np.asarray(generate_anchors(hw, cfg))
    c = np.asarray(B.corners_to_centroid(jnp.asarray(a)))
    k = cfg.num_anchors_per_cell
    # P3 level: fh=16, fw=32, stride 8. Second cell in x is 8px right.
    np.testing.assert_allclose(c[k, 0] - c[0, 0], 8.0, atol=1e-5)
    # next row: fw * k anchors later, 8px down.
    np.testing.assert_allclose(c[32 * k, 1] - c[0, 1], 8.0, atol=1e-5)
    # all 9 anchors of one cell share their center
    np.testing.assert_allclose(c[:k, 0], c[0, 0], atol=1e-4)
    np.testing.assert_allclose(c[:k, 1], c[0, 1], atol=1e-4)


def test_areas_follow_octave_scales():
    cfg = AnchorConfig()
    a = np.asarray(generate_anchors((128, 128), cfg))
    areas = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    # per-cell anchor order: scale-major, ratio-minor; ratios preserve area.
    base = 32.0 ** 2
    expect = [base * s ** 2 for s in cfg.octave_scales for _ in cfg.aspect_ratios]
    np.testing.assert_allclose(areas[:9], expect, rtol=1e-5)
