"""COCO 2D detection dataset handler.

No confirmed reference counterpart (SURVEY.md §2 notes COCO likely absent from
the reference, recalled BDD+KITTI only), but BASELINE.json config #4 requires
"COCO-scale eval: vmap MC samples x data-parallel images across a TPU mesh",
so the framework ships a handler with the same protocol as KittiDataset /
BddDataset. Parses the standard instances_<split>.json annotation format
without a pycocotools dependency (pure json + dict indexing).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class CocoDataset:
    """Index over a COCO-format detection split.

    Layout:
      <root>/annotations/instances_<split>.json
      <root>/<split>/<file_name>
    """

    def __init__(self, root: str, split: str = "train2017"):
        self.root = root
        self.split = split
        path = os.path.join(root, "annotations", f"instances_{split}.json")
        with open(path) as f:
            raw = json.load(f)
        # Category ids are sparse in COCO; remap to contiguous 1..C.
        cats = sorted(raw["categories"], key=lambda c: c["id"])
        self._cat_remap = {c["id"]: i + 1 for i, c in enumerate(cats)}
        self._class_names = tuple(c["name"] for c in cats)
        self.images: List[dict] = raw["images"]
        self._annos_by_image: Dict[int, List[dict]] = {}
        # Crowd annotations are kept separately: excluded from training
        # targets, surfaced as ignore regions to the COCO-protocol evaluator
        # (eval/coco.py — dets inside a crowd are neither TP nor FP).
        self._crowds_by_image: Dict[int, List[dict]] = {}
        for a in raw["annotations"]:
            bucket = (
                self._crowds_by_image
                if a.get("iscrowd", 0)
                else self._annos_by_image
            )
            bucket.setdefault(a["image_id"], []).append(a)

    def __len__(self) -> int:
        return len(self.images)

    @property
    def num_classes(self) -> int:
        return len(self._class_names)

    @property
    def class_names(self) -> Sequence[str]:
        return self._class_names

    def image_path(self, index: int) -> str:
        return os.path.join(self.root, self.split, self.images[index]["file_name"])

    def example(self, index: int) -> Dict[str, np.ndarray]:
        from bayesod_tpu.data.loader import load_image_rgb

        info = self.images[index]
        annos = self._annos_by_image.get(info["id"], [])
        boxes, classes = [], []
        for a in annos:
            x, y, w, h = a["bbox"]  # COCO xywh -> corners
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            classes.append(self._cat_remap[a["category_id"]])
        image = load_image_rgb(self.image_path(index))
        return {
            "image": image,
            "boxes": (
                np.asarray(boxes, np.float32)
                if boxes
                else np.zeros((0, 4), np.float32)
            ),
            "classes": np.asarray(classes, np.int32),
            "id": str(info["id"]),
        }

    def example_id(self, index: int) -> str:
        return str(self.images[index]["id"])

    def ground_truth(self, index: int) -> Dict:
        """Eval-grade GT from the in-memory annotation index — no pixel
        decode. Image size comes from the instances JSON (standard fields),
        falling back to a header read."""
        info = self.images[index]
        boxes, classes, areas = [], [], []
        for a in self._annos_by_image.get(info["id"], []):
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            boxes.append([x, y, x + w, y + h])
            classes.append(self._cat_remap[a["category_id"]])
            # COCO area-range gating uses the segmentation ``area`` field
            # when present, not the box area.
            areas.append(float(a.get("area", w * h)))
        crowd_boxes, crowd_classes = [], []
        for a in self._crowds_by_image.get(info["id"], []):
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            crowd_boxes.append([x, y, x + w, y + h])
            crowd_classes.append(self._cat_remap[a["category_id"]])
        if "height" in info and "width" in info:
            hw = (int(info["height"]), int(info["width"]))
        else:
            from PIL import Image

            with Image.open(self.image_path(index)) as im:
                w_, h_ = im.size
            hw = (h_, w_)
        return {
            "boxes": (
                np.asarray(boxes, np.float32)
                if boxes
                else np.zeros((0, 4), np.float32)
            ),
            "classes": np.asarray(classes, np.int32),
            "areas": np.asarray(areas, np.float64),
            "crowd_boxes": (
                np.asarray(crowd_boxes, np.float32)
                if crowd_boxes
                else np.zeros((0, 4), np.float32)
            ),
            "crowd_classes": np.asarray(crowd_classes, np.int32),
            "hw": hw,
            "annotations": None,
        }


def write_coco_results(
    records,
    dataset: Optional["CocoDataset"],
    out_path: str,
    score_threshold: float = 0.0,
) -> str:
    """Dump detections in the official COCO results format: one JSON list of
    {"image_id", "category_id", "bbox" [x,y,w,h], "score"} — directly
    consumable by pycocotools / the COCO evaluation server (the COCO side of
    the cross-tool output surface, like write_kitti_results /
    write_bdd_results).

    `records` are evaluator dump records (corner boxes in ORIGINAL image
    coordinates, contiguous class ids 1..C). `dataset` supplies the inverse
    of the contiguous->sparse category-id remap; pass None to emit the
    contiguous ids unchanged (synthetic/self-contained splits).
    """
    if dataset is not None:
        inv = {v: k for k, v in dataset._cat_remap.items()}
    else:
        inv = None
    out = []
    for rec in records:
        image_id = int(rec["id"]) if str(rec["id"]).isdigit() else rec["id"]
        for box, cls, score in zip(
            rec["boxes"], rec["classes"], rec["scores"]
        ):
            cid = int(cls)
            if score < score_threshold or cid < 1:
                continue
            if inv is not None:
                if cid not in inv:
                    continue
                cid = inv[cid]
            x1, y1, x2, y2 = (float(v) for v in box)
            out.append(
                {
                    "image_id": image_id,
                    "category_id": cid,
                    "bbox": [x1, y1, x2 - x1, y2 - y1],
                    "score": float(score),
                }
            )
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out_path
