"""BDD100K 2D detection dataset handler.

Rebuild of the reference's BDD handler (SURVEY.md §2 "BDD100K dataset
handler"; ref: src/retina_net/datasets/ bdd module): parses the official
label JSON (`bdd100k_labels_images_{train,val}.json` — a list of per-image
records with `labels[].category` and `labels[].box2d{x1,y1,x2,y2}`), 10
foreground classes, 1280x720 JPEGs under `images/100k/<split>/`.

Host-side numpy only; fixed-shape device preprocessing is shared with KITTI
(data/preprocess.py).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

BDD_CLASSES: Tuple[str, ...] = (
    "car",
    "bus",
    "truck",
    "person",
    "rider",
    "bike",
    "motor",
    "traffic light",
    "traffic sign",
    "train",
)
BDD_CLASS_TO_ID: Dict[str, int] = {n: i + 1 for i, n in enumerate(BDD_CLASSES)}


class BddDataset:
    """Index over one BDD100K split.

    Layout (reference convention):
      <root>/labels/bdd100k_labels_images_<split>.json
      <root>/images/100k/<split>/<name>.jpg
    """

    def __init__(self, root: str, split: str = "train"):
        self.root = root
        self.split = split
        labels_path = os.path.join(
            root, "labels", f"bdd100k_labels_images_{split}.json"
        )
        with open(labels_path) as f:
            self.records: List[dict] = json.load(f)
        self.image_dir = os.path.join(root, "images", "100k", split)

    def __len__(self) -> int:
        return len(self.records)

    @property
    def num_classes(self) -> int:
        return len(BDD_CLASSES)

    @property
    def class_names(self) -> Sequence[str]:
        return BDD_CLASSES

    def image_path(self, index: int) -> str:
        return os.path.join(self.image_dir, self.records[index]["name"])

    def example(self, index: int) -> Dict[str, np.ndarray]:
        """dict(image uint8 [H,W,3], boxes fp32 [G,4], classes int32 [G], id)."""
        from bayesod_tpu.data.loader import load_image_rgb

        rec = self.records[index]
        boxes, classes = [], []
        for label in rec.get("labels", []):
            cid = BDD_CLASS_TO_ID.get(label.get("category", ""))
            box2d = label.get("box2d")
            if cid is None or box2d is None:
                continue
            boxes.append([box2d["x1"], box2d["y1"], box2d["x2"], box2d["y2"]])
            classes.append(cid)
        image = load_image_rgb(self.image_path(index))
        return {
            "image": image,
            "boxes": (
                np.asarray(boxes, np.float32)
                if boxes
                else np.zeros((0, 4), np.float32)
            ),
            "classes": np.asarray(classes, np.int32),
            "id": os.path.splitext(rec["name"])[0],
        }

    def example_id(self, index: int) -> str:
        return os.path.splitext(self.records[index]["name"])[0]

    def ground_truth(self, index: int) -> Dict:
        """Eval-grade GT from the in-memory label JSON — no pixel decode.
        Image size comes from the JPEG header when the file exists, else the
        official BDD100K frame size (720x1280)."""
        rec = self.records[index]
        boxes, classes = [], []
        for label in rec.get("labels", []):
            cid = BDD_CLASS_TO_ID.get(label.get("category", ""))
            box2d = label.get("box2d")
            if cid is None or box2d is None:
                continue
            boxes.append([box2d["x1"], box2d["y1"], box2d["x2"], box2d["y2"]])
            classes.append(cid)
        path = self.image_path(index)
        if os.path.exists(path):
            from PIL import Image

            with Image.open(path) as im:
                w, h = im.size
            hw = (h, w)
        else:
            hw = (720, 1280)
        return {
            "boxes": (
                np.asarray(boxes, np.float32)
                if boxes
                else np.zeros((0, 4), np.float32)
            ),
            "classes": np.asarray(classes, np.int32),
            "hw": hw,
            "annotations": None,
        }


def write_bdd_results(
    records,
    out_path: str,
    score_threshold: float = 0.0,
) -> str:
    """Dump detections in the official BDD100K detection submission format
    (one JSON list, per-image entries with `labels[].category/box2d/score`
    — consumable by the bdd100k eval toolkit; the BDD side of the
    reference's cross-tool output surface, SURVEY.md §2 "BDD100K handler").

    `records` are evaluator dump records (boxes in ORIGINAL image
    coordinates); ids map back to `<name>.jpg` frame names.
    """
    out = []
    for rec in records:
        labels = []
        for box, cls, score in zip(
            rec["boxes"], rec["classes"], rec["scores"]
        ):
            cid = int(cls)
            if score < score_threshold or not (1 <= cid <= len(BDD_CLASSES)):
                continue
            x1, y1, x2, y2 = (float(v) for v in box)
            labels.append(
                {
                    "category": BDD_CLASSES[cid - 1],
                    "box2d": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
                    "score": float(score),
                }
            )
        out.append({"name": f"{rec['id']}.jpg", "labels": labels})
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out_path
