"""Dense multi-level FPN anchor grid generation.

TPU-native rebuild of the reference's anchor generator
(ref: src/retina_net/anchor_generator/ — canonical RetinaNet grid over FPN
levels P3-P7: per-level stride 2^l, areas (base_scale * stride)^2, 3 octave
scales x 3 aspect ratios = 9 anchors per cell; SURVEY.md §2 "Anchor
generator"). The grid is a deterministic function of the static padded image
shape, so it is computed once per config at trace time and baked into the jit
graph as a constant — no host<->device traffic per image.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor grid hyperparameters (YAML-exposed; SURVEY.md §2 config table)."""

    min_level: int = 3
    max_level: int = 7
    # Anchor edge at octave scale 1 is `base_scale * stride`, i.e. 32px at P3.
    base_scale: float = 4.0
    octave_scales: Tuple[float, ...] = (2 ** 0.0, 2 ** (1.0 / 3.0), 2 ** (2.0 / 3.0))
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.octave_scales) * len(self.aspect_ratios)

    @property
    def strides(self) -> Tuple[int, ...]:
        return tuple(2 ** l for l in range(self.min_level, self.max_level + 1))


def feature_shapes(
    image_hw: Tuple[int, int], config: AnchorConfig
) -> Tuple[Tuple[int, int], ...]:
    """Per-level (h, w) feature map shapes for a padded image shape.

    The image shape must be divisible by the coarsest stride so that the FPN
    pyramid and the anchor grid agree exactly (fixed static shapes; no
    ceil-div ambiguity inside jit).
    """
    h, w = image_hw
    max_stride = 2 ** config.max_level
    if h % max_stride or w % max_stride:
        raise ValueError(
            f"image shape {image_hw} must be divisible by max stride {max_stride}"
        )
    return tuple((h // s, w // s) for s in config.strides)


def level_anchor_counts(image_hw, config: AnchorConfig) -> Tuple[int, ...]:
    """Number of anchors contributed by each pyramid level."""
    k = config.num_anchors_per_cell
    return tuple(fh * fw * k for fh, fw in feature_shapes(image_hw, config))


def _cell_anchors(stride: int, config: AnchorConfig) -> np.ndarray:
    """The 9 (scale x ratio) anchors centered at the origin, corner format."""
    out = []
    for scale in config.octave_scales:
        edge = config.base_scale * stride * scale
        anchor_area = edge * edge
        for ratio in config.aspect_ratios:
            # ratio = h / w ; preserve area.
            w = np.sqrt(anchor_area / ratio)
            h = w * ratio
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)  # [K, 4]


def generate_anchors(image_hw, config: AnchorConfig = AnchorConfig()) -> jnp.ndarray:
    """All anchors for an image shape, corner format, [A_total, 4] fp32.

    Layout matches the model's head output flattening: levels in ascending
    order, within a level row-major over (y, x), innermost the K per-cell
    anchors — i.e. reshape([h, w, K, 4]) per level then concat. Anchor centers
    sit at (x + 0.5, y + 0.5) * stride, the canonical cell-center convention.
    Computed in NumPy (trace-time constant), returned as a device array.
    """
    grids = []
    for stride, (fh, fw) in zip(config.strides, feature_shapes(image_hw, config)):
        cell = _cell_anchors(stride, config)  # [K, 4]
        xs = (np.arange(fw, dtype=np.float32) + 0.5) * stride
        ys = (np.arange(fh, dtype=np.float32) + 0.5) * stride
        cx, cy = np.meshgrid(xs, ys)  # [fh, fw]
        centers = np.stack([cx, cy, cx, cy], axis=-1)  # [fh, fw, 4]
        level = centers[:, :, None, :] + cell[None, None, :, :]  # [fh, fw, K, 4]
        grids.append(level.reshape(-1, 4))
    return jnp.asarray(np.concatenate(grids, axis=0))
