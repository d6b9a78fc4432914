"""KITTI 2D object detection dataset handler.

Rebuild of the reference's KITTI handler (SURVEY.md §2 "KITTI dataset
handler"; ref: src/retina_net/datasets/ kitti module): parses the standard
KITTI object label format, one txt per image under `label_2/`, images under
`image_2/`:

  type trunc occl alpha x1 y1 x2 y2 h w l x y z ry

Classes follow the reference/paper setup: {Car, Pedestrian, Cyclist} as
foreground 1..3 with Van->Car and Person_sitting->Pedestrian alias mapping;
DontCare and everything else ignored. Difficulty bins (easy/moderate/hard via
min height / max occlusion / max truncation) are parsed here because the
KITTI AP protocol gates on them at eval time (SURVEY.md §3.3).

Host-side only — produces numpy; the fixed-shape device pipeline lives in
data/preprocess.py.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# Foreground class ids are 1-based; 0 is background everywhere in the
# framework (softmax-categorical with background — heads.py).
KITTI_CLASSES: Tuple[str, ...] = ("car", "pedestrian", "cyclist")
KITTI_CLASS_TO_ID: Dict[str, int] = {
    "car": 1,
    "van": 1,
    "pedestrian": 2,
    "person_sitting": 2,
    "cyclist": 3,
}
KITTI_IGNORED = ("dontcare", "misc", "tram", "truck")

# KITTI difficulty gates (official devkit thresholds):
#   easy:     min bbox height 40px, max occlusion 0, max truncation 0.15
#   moderate: min bbox height 25px, max occlusion 1, max truncation 0.30
#   hard:     min bbox height 25px, max occlusion 2, max truncation 0.50
DIFFICULTY_GATES = {
    "easy": (40.0, 0, 0.15),
    "moderate": (25.0, 1, 0.30),
    "hard": (25.0, 2, 0.50),
}


@dataclasses.dataclass
class KittiAnnotation:
    """One labelled object (subset of KITTI fields the 2D task needs)."""

    class_id: int  # 1..3, or 0 for ignored/DontCare rows
    box: np.ndarray  # [4] corners x1,y1,x2,y2
    truncation: float
    occlusion: int

    def difficulty_ok(self, difficulty: str) -> bool:
        min_h, max_occ, max_trunc = DIFFICULTY_GATES[difficulty]
        h = float(self.box[3] - self.box[1])
        return (
            h >= min_h
            and self.occlusion <= max_occ
            and self.truncation <= max_trunc
        )


def parse_label_file(path: str) -> List[KittiAnnotation]:
    """Parse one KITTI label txt into annotations (ignored rows -> id 0)."""
    out: List[KittiAnnotation] = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 15:
                continue
            name = parts[0].lower()
            class_id = KITTI_CLASS_TO_ID.get(name, 0)
            box = np.array([float(v) for v in parts[4:8]], np.float32)
            out.append(
                KittiAnnotation(
                    class_id=class_id,
                    box=box,
                    truncation=float(parts[1]),
                    occlusion=int(float(parts[2])),
                )
            )
    return out


class KittiDataset:
    """Index over a KITTI object-detection split directory.

    Layout (reference convention, SURVEY.md §1 data tree):
      <root>/training/image_2/??????.png
      <root>/training/label_2/??????.txt
      <root>/<split>.txt  (optional id list; else all labelled frames)
    """

    def __init__(
        self,
        root: str,
        split: str = "train",
        split_file: Optional[str] = None,
    ):
        self.root = root
        self.image_dir = os.path.join(root, "training", "image_2")
        self.label_dir = os.path.join(root, "training", "label_2")
        ids_path = split_file or os.path.join(root, f"{split}.txt")
        if os.path.exists(ids_path):
            with open(ids_path) as f:
                self.ids = [l.strip() for l in f if l.strip()]
        else:
            self.ids = sorted(
                os.path.splitext(n)[0]
                for n in os.listdir(self.label_dir)
                if n.endswith(".txt")
            )

    def __len__(self) -> int:
        return len(self.ids)

    @property
    def num_classes(self) -> int:
        return len(KITTI_CLASSES)

    @property
    def class_names(self) -> Sequence[str]:
        return KITTI_CLASSES

    def image_path(self, index: int) -> str:
        return os.path.join(self.image_dir, f"{self.ids[index]}.png")

    def example(self, index: int) -> Dict[str, np.ndarray]:
        """Raw example: decoded image + foreground GT arrays.

        Returns dict(image uint8 [H,W,3], boxes fp32 [G,4], classes int32 [G],
        id str). Ignored/DontCare rows are dropped here (the reference drops
        them from training targets too); eval reads annotations directly for
        difficulty gating.
        """
        from bayesod_tpu.data.loader import load_image_rgb

        annos = parse_label_file(
            os.path.join(self.label_dir, f"{self.ids[index]}.txt")
        )
        fg = [a for a in annos if a.class_id > 0]
        image = load_image_rgb(self.image_path(index))
        boxes = (
            np.stack([a.box for a in fg]) if fg else np.zeros((0, 4), np.float32)
        )
        classes = np.array([a.class_id for a in fg], np.int32)
        return {
            "image": image,
            "boxes": boxes.astype(np.float32),
            "classes": classes,
            "id": self.ids[index],
        }

    def annotations(self, index: int) -> List[KittiAnnotation]:
        return parse_label_file(
            os.path.join(self.label_dir, f"{self.ids[index]}.txt")
        )

    def example_id(self, index: int) -> str:
        """Record id without touching image or label files."""
        return self.ids[index]

    def ground_truth(self, index: int) -> Dict:
        """Eval-grade GT: ONE label parse, image size from the PNG header
        (PIL reads dimensions lazily — no pixel decode). Returns
        dict(boxes [G,4], classes [G], hw (H, W), annotations) where
        `annotations` is the full parsed list incl. ignored rows for
        difficulty gating."""
        from PIL import Image

        annos = self.annotations(index)
        fg = [a for a in annos if a.class_id > 0]
        boxes = (
            np.stack([a.box for a in fg]) if fg else np.zeros((0, 4), np.float32)
        )
        with Image.open(self.image_path(index)) as im:
            w, h = im.size
        return {
            "boxes": boxes.astype(np.float32),
            "classes": np.array([a.class_id for a in fg], np.int32),
            "hw": (h, w),
            "annotations": annos,
        }


def write_kitti_results(
    records,
    dataset: "KittiDataset",
    out_dir: str,
    score_threshold: float = 0.0,
) -> str:
    """Dump detections in the official KITTI results format (one txt per
    frame, consumable by the KITTI devkit — the reference's native output
    for cross-tool evaluation):

      type trunc occl alpha x1 y1 x2 y2 h w l x y z ry score

    2D-only fields are filled with the devkit's "unknown" sentinels
    (-1 / -10 / -1000), exactly like 2D detectors submitting to the server.
    """
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    names = {i + 1: n.capitalize() for i, n in enumerate(KITTI_CLASSES)}
    for idx, rec in enumerate(records):
        frame_id = rec.get("id", f"{idx:06d}")
        lines = []
        for box, cls, score in zip(
            rec["boxes"], rec["classes"], rec["scores"]
        ):
            if score < score_threshold or int(cls) not in names:
                continue
            x1, y1, x2, y2 = [float(v) for v in box]
            lines.append(
                f"{names[int(cls)]} -1 -1 -10 "
                f"{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} "
                f"-1 -1 -1 -1000 -1000 -1000 -10 {float(score):.4f}"
            )
        with open(_os.path.join(out_dir, f"{frame_id}.txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    return out_dir
