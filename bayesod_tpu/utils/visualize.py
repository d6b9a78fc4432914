"""Detection visualization: boxes, labels, and covariance ellipses.

Counterpart of the reference's core vis utils (SURVEY.md §1 L1 "generic
eval/vis utils"): draws per-detection corner boxes with class/score labels
and — the BayesOD-specific part — 95% confidence ellipses for the top-left
and bottom-right corners derived from the 4x4 posterior covariance
(paper Fig. 1-style qualitative output). Pure PIL; host-side only.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import numpy as np

_COLORS = [
    (230, 70, 70),
    (70, 200, 70),
    (80, 120, 250),
    (240, 200, 60),
    (200, 80, 220),
    (70, 220, 220),
    (250, 140, 50),
    (160, 160, 160),
    (120, 220, 120),
    (220, 120, 160),
]


def _ellipse_points(mean, cov2, n_std=2.4477, segments=24):
    """Boundary points of the n_std ellipse of a 2x2 covariance (95% ~ 2.45)."""
    vals, vecs = np.linalg.eigh(cov2)
    vals = np.maximum(vals, 1e-9)
    t = np.linspace(0, 2 * math.pi, segments)
    circle = np.stack([np.cos(t), np.sin(t)])  # [2, S]
    pts = (vecs * np.sqrt(vals) * n_std) @ circle + np.asarray(mean)[:, None]
    return [tuple(p) for p in pts.T]


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    classes: np.ndarray,
    scores: np.ndarray,
    covs: Optional[np.ndarray] = None,
    class_names: Optional[Sequence[str]] = None,
    score_threshold: float = 0.3,
    line_width: int = 2,
):
    """Returns a PIL image with detections drawn.

    image uint8 [H,W,3]; boxes [D,4] corners; classes [D] (1-based fg ids);
    scores [D]; covs optional [D,4,4] corner-space covariance.
    """
    from PIL import Image, ImageDraw

    img = Image.fromarray(image.astype(np.uint8)).convert("RGB")
    draw = ImageDraw.Draw(img)
    for d in range(len(boxes)):
        if scores[d] < score_threshold or classes[d] <= 0:
            continue
        color = _COLORS[(int(classes[d]) - 1) % len(_COLORS)]
        x1, y1, x2, y2 = [float(v) for v in boxes[d]]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=line_width)
        name = (
            class_names[int(classes[d]) - 1]
            if class_names is not None and 0 < classes[d] <= len(class_names)
            else str(int(classes[d]))
        )
        draw.text((x1 + 2, max(y1 - 12, 0)), f"{name} {scores[d]:.2f}", fill=color)
        if covs is not None:
            # Corner marginals: top-left uses cov[(0,1)x(0,1)], bottom-right
            # cov[(2,3)x(2,3)].
            for mean, sl in (((x1, y1), slice(0, 2)), ((x2, y2), slice(2, 4))):
                pts = _ellipse_points(mean, np.asarray(covs[d][sl, sl]))
                draw.polygon(pts, outline=color)
    return img


def save_detection_grid(
    records: Sequence[Dict],
    dataset,
    out_path: str,
    max_images: int = 4,
    score_threshold: float = 0.3,
):
    """Render the first few eval records side by side into one PNG."""
    from PIL import Image

    tiles = []
    for idx, rec in enumerate(records[:max_images]):
        ex = dataset.example(idx)
        img = draw_detections(
            ex["image"],
            np.asarray(rec["boxes"], np.float32).reshape(-1, 4),
            np.asarray(rec["classes"], np.int32),
            np.asarray(rec["scores"], np.float32),
            np.asarray(rec["covs"], np.float32).reshape(-1, 4, 4),
            class_names=list(dataset.class_names),
            score_threshold=score_threshold,
        )
        tiles.append(img)
    h = max(t.height for t in tiles)
    w = sum(t.width for t in tiles)
    grid = Image.new("RGB", (w, h))
    x = 0
    for t in tiles:
        grid.paste(t, (x, 0))
        x += t.width
    grid.save(out_path)
    return out_path
