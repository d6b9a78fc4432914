"""Dataset-layout preflight: validate an on-disk KITTI/BDD/COCO tree before
spending TPU time on it (VERDICT r2 "real-data readiness").

No real KITTI/BDD/COCO data has ever been present in this environment, so
the first real-data run will happen cold; this check makes it turnkey: it
validates exactly what the Loader/trainer will consume — split sizes,
annotation parses, class-id ranges, box geometry, one actual image decode —
and reports it all in one shot instead of failing 40 s into a train step.

  python -m bayesod_tpu.cli.train --yaml_path configs/retinanet_kitti.yaml \
      --check_data           # prints the report, exits 0/1, never touches TPU
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class PreflightError(Exception):
    """A dataset problem that would break training/eval."""


def _check_split(dataset, split: str, sample: int, decode: bool) -> Dict:
    """Validate one split; returns a report dict, raises PreflightError."""
    n = len(dataset)
    if n == 0:
        raise PreflightError(f"split '{split}' is empty")
    num_classes = dataset.num_classes
    idxs = sorted({0, n // 2, n - 1} | set(
        np.linspace(0, n - 1, min(sample, n), dtype=int).tolist()
    ))

    class_counts = np.zeros(num_classes + 1, np.int64)
    boxes_seen = 0
    degenerate: List[str] = []
    out_of_frame: List[str] = []
    for i in idxs:
        rec_id = dataset.example_id(i)
        try:
            gt = dataset.ground_truth(i)
        except Exception as e:  # noqa: BLE001 — wrap with the offending id
            raise PreflightError(
                f"split '{split}': annotation parse failed for id "
                f"'{rec_id}': {type(e).__name__}: {e}"
            ) from e
        boxes = np.asarray(gt["boxes"], np.float32).reshape(-1, 4)
        classes = np.asarray(gt["classes"], np.int64).reshape(-1)
        if boxes.shape[0] != classes.shape[0]:
            raise PreflightError(
                f"split '{split}' id '{rec_id}': {boxes.shape[0]} boxes vs "
                f"{classes.shape[0]} class labels"
            )
        if not np.all(np.isfinite(boxes)):
            raise PreflightError(
                f"split '{split}' id '{rec_id}': non-finite box coordinates"
            )
        if classes.size and (classes.min() < 1 or classes.max() > num_classes):
            raise PreflightError(
                f"split '{split}' id '{rec_id}': class ids outside "
                f"1..{num_classes}: {sorted(set(classes.tolist()))}"
            )
        bad = (boxes[:, 2] <= boxes[:, 0]) | (boxes[:, 3] <= boxes[:, 1])
        if bad.any():
            degenerate.append(rec_id)
        oh, ow = gt["hw"]
        outside = (
            (boxes[:, 0] < -1) | (boxes[:, 1] < -1)
            | (boxes[:, 2] > ow + 1) | (boxes[:, 3] > oh + 1)
        )
        if outside.any():
            out_of_frame.append(rec_id)
        np.add.at(class_counts, classes, 1)
        boxes_seen += boxes.shape[0]

    report: Dict = {
        "split": split,
        "images": n,
        "sampled": len(idxs),
        "boxes_sampled": boxes_seen,
        "class_counts": {
            name: int(class_counts[ci])
            for ci, name in enumerate(dataset.class_names, start=1)
        },
        "degenerate_box_ids": degenerate[:5],
        "out_of_frame_ids": out_of_frame[:5],
    }

    if decode:
        ex = dataset.example(idxs[0])  # full path: labels + pixel decode
        img = ex["image"]
        if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
            raise PreflightError(
                f"split '{split}': decoded image has dtype={img.dtype} "
                f"shape={img.shape}, expected uint8 [H, W, 3]"
            )
        report["decoded_hw"] = [int(img.shape[0]), int(img.shape[1])]
    return report


def check_data(
    data_cfg,
    splits: Sequence[str] = ("train", "val"),
    sample: int = 64,
    decode: bool = True,
) -> List[Dict]:
    """Validate every split the config will use. Raises PreflightError with
    the offending id on hard problems; soft problems (degenerate /
    out-of-frame boxes, empty classes) land in the report for the caller to
    print — the Loader tolerates them, but they usually indicate a wrong
    root or a half-downloaded dataset."""
    from bayesod_tpu.data import make_dataset

    reports = []
    for split in splits:
        try:
            dataset = make_dataset(data_cfg, split=split)
        except Exception as e:  # noqa: BLE001
            raise PreflightError(
                f"could not build dataset '{data_cfg.dataset}' split "
                f"'{split}' from root '{data_cfg.data_dir}': "
                f"{type(e).__name__}: {e}"
            ) from e
        reports.append(_check_split(dataset, split, sample, decode))
    return reports


def format_report(reports: Sequence[Dict]) -> str:
    lines = []
    for r in reports:
        lines.append(
            f"split {r['split']}: {r['images']} images OK "
            f"({r['sampled']} sampled, {r['boxes_sampled']} boxes)"
        )
        if "decoded_hw" in r:
            lines.append(
                f"  decoded one image: {r['decoded_hw'][0]}x{r['decoded_hw'][1]}"
            )
        counts = ", ".join(f"{k}={v}" for k, v in r["class_counts"].items())
        lines.append(f"  class counts (sampled): {counts}")
        empty = [k for k, v in r["class_counts"].items() if v == 0]
        if empty:
            lines.append(
                f"  WARNING: no sampled instances of: {', '.join(empty)}"
            )
        if r["degenerate_box_ids"]:
            lines.append(
                "  WARNING: degenerate boxes (x2<=x1 or y2<=y1) in ids: "
                + ", ".join(r["degenerate_box_ids"])
            )
        if r["out_of_frame_ids"]:
            lines.append(
                "  WARNING: boxes outside the image frame in ids: "
                + ", ".join(r["out_of_frame_ids"])
            )
    return "\n".join(lines)
