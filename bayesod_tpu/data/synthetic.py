"""Synthetic rendered-rectangles dataset for smoke training and benchmarks.

No reference counterpart (the reference assumes real KITTI/BDD on disk,
unavailable offline — SURVEY.md §6): deterministic per-index RNG draws 1..max
colored axis-aligned rectangles on a noise background; the class is determined
by the rectangle's color channel, so a detector must actually learn
appearance -> class to drive the loss down. Used by tests, the CLI's
`dataset: synthetic` mode, and bench.py's input pipeline.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

SYNTHETIC_CLASSES: Tuple[str, ...] = ("red", "green", "blue")


class SyntheticDataset:
    """Procedural dataset with the same handler protocol as KITTI/BDD."""

    def __init__(
        self,
        size: int = 512,
        image_hw: Tuple[int, int] = (256, 256),
        max_objects: int = 4,
        seed: int = 0,
    ):
        self.size = size
        self.image_hw = image_hw
        self.max_objects = max_objects
        self.seed = seed

    def __len__(self) -> int:
        return self.size

    @property
    def num_classes(self) -> int:
        return len(SYNTHETIC_CLASSES)

    @property
    def class_names(self) -> Sequence[str]:
        return SYNTHETIC_CLASSES

    def example(self, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(self.seed * 1_000_003 + index)
        h, w = self.image_hw
        image = rng.integers(0, 60, (h, w, 3), dtype=np.uint8)
        n = int(rng.integers(1, self.max_objects + 1))
        # Box sides scale with min(h, w), NOT per-dimension: at non-square
        # shapes the old per-dimension draw produced aspect ratios up to
        # (w/h) * 3 — at 384x1280 a median AR of 3.4, leaving 27% of GT
        # with no anchor above IoU 0.5 under the canonical {0.5, 1, 2}
        # anchor set (force-match only). min-side scaling keeps AR in
        # [1/3, 3] at every image shape and is bit-identical to the old
        # stream on square images (same two uniform draws).
        side = float(min(h, w))
        boxes, classes = [], []
        for _ in range(n):
            bw = float(rng.uniform(0.15, 0.45) * side)
            bh = float(rng.uniform(0.15, 0.45) * side)
            x1 = float(rng.uniform(0, w - bw))
            y1 = float(rng.uniform(0, h - bh))
            cid = int(rng.integers(1, len(SYNTHETIC_CLASSES) + 1))
            color = np.array([40, 40, 40], np.uint8)
            color[cid - 1] = 220
            image[int(y1) : int(y1 + bh), int(x1) : int(x1 + bw)] = color
            boxes.append([x1, y1, x1 + bw, y1 + bh])
            classes.append(cid)
        return {
            "image": image,
            "boxes": np.asarray(boxes, np.float32),
            "classes": np.asarray(classes, np.int32),
            "id": f"synthetic_{index:06d}",
        }

    def example_id(self, index: int) -> str:
        return f"synthetic_{index:06d}"

    def ground_truth(self, index: int) -> Dict:
        """GT without the image. The box draws are interleaved with the
        background-noise draw in example()'s RNG stream, so this reuses
        example() (pure procedural compute, no IO) rather than changing the
        stream and invalidating every recorded synthetic-run metric."""
        ex = self.example(index)
        return {
            "boxes": ex["boxes"],
            "classes": ex["classes"],
            "hw": self.image_hw,
            "annotations": None,
        }
