"""COCO-protocol evaluator tests with hand-computed oracles (SURVEY.md §4).

pycocotools is not installed in this environment, so every expected value
below is derived by hand from the official cocoeval semantics: AP averaged
over IoU 0.50:0.05:0.95 with 101-point interpolation, area-range ignores,
crowd-region absorption, AR at detection budgets.
"""

import numpy as np
import pytest

from bayesod_tpu.eval.coco import (
    AREA_RANGES,
    IOU_THRESHOLDS,
    CocoImage,
    evaluate_coco,
)


def box(x1, y1, x2, y2):
    return np.array([[x1, y1, x2, y2]], np.float32)


def image(det_boxes, det_scores, det_classes, gt_boxes, gt_classes, **kw):
    return CocoImage(
        det_boxes=np.asarray(det_boxes, np.float32).reshape(-1, 4),
        det_scores=np.asarray(det_scores, np.float32),
        det_classes=np.asarray(det_classes, np.int32),
        gt_boxes=np.asarray(gt_boxes, np.float32).reshape(-1, 4),
        gt_classes=np.asarray(gt_classes, np.int32),
        **kw,
    )


class TestCocoAP:
    def test_perfect_detection_all_ones(self):
        ims = [
            image(box(0, 0, 50, 50), [0.9], [1], box(0, 0, 50, 50), [1])
            for _ in range(3)
        ]
        m = evaluate_coco(ims, class_ids=[1])
        assert m["coco_ap"] == pytest.approx(1.0)
        assert m["coco_ap50"] == pytest.approx(1.0)
        assert m["coco_ap75"] == pytest.approx(1.0)
        assert m["coco_ar@1"] == pytest.approx(1.0)
        assert m["coco_ap_cls1"] == pytest.approx(1.0)

    def test_iou_07_matches_five_thresholds(self):
        # det [0,0,10,7] vs gt [0,0,10,10]: inter=70, union=100 -> IoU 0.7
        # exactly. TP at thresholds 0.50..0.70 (5 of 10); with one det and
        # one GT, AP at a matched threshold is 1.0, else 0.0.
        im = image(box(0, 0, 10, 7), [0.9], [1], box(0, 0, 10, 10), [1])
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap"] == pytest.approx(0.5)
        assert m["coco_ap50"] == pytest.approx(1.0)
        assert m["coco_ap75"] == pytest.approx(0.0)

    def test_high_scoring_fp_halves_precision_envelope(self):
        # FP (no overlap) scored ABOVE the TP: ranking = [FP, TP], so at
        # recall 1.0 precision is 0.5 and the envelope is 0.5 everywhere
        # except... envelope = max precision at recall >= r = 0.5 for all r.
        im = image(
            np.concatenate([box(100, 100, 110, 110), box(0, 0, 10, 10)]),
            [0.9, 0.8],
            [1, 1],
            box(0, 0, 10, 10),
            [1],
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap"] == pytest.approx(0.5)

    def test_fp_below_last_tp_does_not_hurt(self):
        # cocoeval's interpolated AP ignores FPs ranked after the last TP.
        im = image(
            np.concatenate([box(0, 0, 10, 10), box(100, 100, 110, 110)]),
            [0.9, 0.8],
            [1, 1],
            box(0, 0, 10, 10),
            [1],
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap"] == pytest.approx(1.0)

    def test_second_detection_on_same_gt_is_fp(self):
        im = image(
            np.concatenate([box(0, 0, 10, 10), box(0, 0, 10, 10)]),
            [0.8, 0.9],  # the 0.9 one matches first
            [1, 1],
            box(0, 0, 10, 10),
            [1],
        )
        m = evaluate_coco([im], class_ids=[1])
        # ranking = [TP, FP-after-TP] -> AP unaffected by the trailing FP
        assert m["coco_ap"] == pytest.approx(1.0)

    def test_classes_do_not_cross_match(self):
        im = image(box(0, 0, 10, 10), [0.9], [2], box(0, 0, 10, 10), [1])
        m = evaluate_coco([im], class_ids=[1, 2])
        # class 1: unmatched GT, FP-free but recall 0 -> AP 0.
        # class 2: no GT anywhere -> NaN cell, excluded from the mean.
        assert m["coco_ap"] == pytest.approx(0.0)
        assert "coco_ap_cls2" not in m

    def test_mean_skips_classes_without_gt(self):
        ims = [
            image(box(0, 0, 50, 50), [0.9], [1], box(0, 0, 50, 50), [1])
        ]
        m = evaluate_coco(ims, class_ids=[1, 2, 3])
        assert m["coco_ap"] == pytest.approx(1.0)


class TestCrowdRegions:
    def test_crowd_absorbs_high_scoring_detection(self):
        # Detection fully inside a crowd region scored ABOVE the real TP:
        # without crowd handling it would pin precision at 0.5; with it the
        # det is dropped from the ranking and AP stays 1.0.
        im = image(
            np.concatenate([box(200, 200, 210, 210), box(0, 0, 10, 10)]),
            [0.95, 0.9],
            [1, 1],
            box(0, 0, 10, 10),
            [1],
            crowd_boxes=np.array([[190, 190, 300, 300]], np.float32),
            crowd_classes=np.array([1], np.int32),
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap"] == pytest.approx(1.0)

    def test_crowd_absorbs_many_detections(self):
        dets = np.array(
            [[200 + i, 200, 210 + i, 210] for i in range(4)], np.float32
        )
        im = image(
            np.concatenate([dets, box(0, 0, 10, 10)]),
            [0.99, 0.98, 0.97, 0.96, 0.9],
            [1] * 5,
            box(0, 0, 10, 10),
            [1],
            crowd_boxes=np.array([[150, 150, 300, 300]], np.float32),
            crowd_classes=np.array([1], np.int32),
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap"] == pytest.approx(1.0)

    def test_crowd_of_other_class_does_not_absorb(self):
        im = image(
            np.concatenate([box(200, 200, 210, 210), box(0, 0, 10, 10)]),
            [0.95, 0.9],
            [1, 1],
            box(0, 0, 10, 10),
            [1],
            crowd_boxes=np.array([[190, 190, 300, 300]], np.float32),
            crowd_classes=np.array([2], np.int32),
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap"] == pytest.approx(0.5)


class TestAreaRanges:
    def test_ranges_partition(self):
        assert AREA_RANGES["small"][1] == AREA_RANGES["medium"][0]
        assert AREA_RANGES["medium"][1] == AREA_RANGES["large"][0]

    def test_small_gt_scores_only_in_small(self):
        # 16x16 = 256 px^2 < 32^2.
        im = image(box(0, 0, 16, 16), [0.9], [1], box(0, 0, 16, 16), [1])
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap_small"] == pytest.approx(1.0)
        # no medium/large GT anywhere -> NaN cells reported as 0.0
        assert m["coco_ap_medium"] == pytest.approx(0.0)
        assert m["coco_ap_large"] == pytest.approx(0.0)

    def test_out_of_range_unmatched_det_not_fp(self):
        # Large GT matched by a large det; an extra SMALL unmatched det
        # scored higher must not count as FP in the "large" cell (cocoeval
        # drops out-of-range unmatched detections from the ranking).
        im = image(
            np.concatenate([box(300, 300, 310, 310), box(0, 0, 100, 100)]),
            [0.95, 0.9],
            [1, 1],
            box(0, 0, 100, 100),
            [1],
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap_large"] == pytest.approx(1.0)
        # In the "all" cell the same small det IS a normal FP above the TP.
        assert m["coco_ap"] == pytest.approx(0.5)

    def test_segmentation_area_overrides_box_area(self):
        # Box is 100x100 (large) but the provided segmentation area is tiny:
        # the GT must gate into "small", cocoeval-style.
        im = image(
            box(0, 0, 100, 100),
            [0.9],
            [1],
            box(0, 0, 100, 100),
            [1],
            gt_areas=np.array([100.0]),
        )
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ap_small"] == pytest.approx(1.0)
        assert m["coco_ap_large"] == pytest.approx(0.0)


class TestAR:
    def test_ar_budgets(self):
        # 3 GT, 3 perfect dets; at budget 1 only the top det survives.
        gts = np.array(
            [[0, 0, 10, 10], [20, 20, 30, 30], [40, 40, 50, 50]], np.float32
        )
        im = image(gts, [0.9, 0.8, 0.7], [1, 1, 1], gts, [1, 1, 1])
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ar@1"] == pytest.approx(1.0 / 3.0)
        assert m["coco_ar@10"] == pytest.approx(1.0)
        assert m["coco_ar@100"] == pytest.approx(1.0)

    def test_ar_averages_over_thresholds(self):
        # IoU-0.7 det: recalled at 5 of 10 thresholds -> AR = 0.5.
        im = image(box(0, 0, 10, 7), [0.9], [1], box(0, 0, 10, 10), [1])
        m = evaluate_coco([im], class_ids=[1])
        assert m["coco_ar@100"] == pytest.approx(0.5)


class TestThresholdGrid:
    def test_grid_is_the_official_ten(self):
        np.testing.assert_allclose(
            IOU_THRESHOLDS, np.round(np.arange(0.5, 0.96, 0.05), 2)
        )
        assert len(IOU_THRESHOLDS) == 10


class TestEvaluateIntegration:
    def test_evaluate_coco_dataset(self, tmp_path):
        """End-to-end: synthetic COCO split on disk -> dumped records ->
        evaluate() returns the COCO summary keyed per class."""
        import dataclasses
        import json

        from bayesod_tpu.eval.evaluator import evaluate
        from bayesod_tpu.utils.config import ExperimentConfig

        root = tmp_path / "coco"
        (root / "annotations").mkdir(parents=True)
        (root / "val2017").mkdir()
        images, annos = [], []
        rng = np.random.default_rng(0)
        for i in range(4):
            images.append(
                {
                    "id": 100 + i,
                    "file_name": f"{i}.jpg",
                    "height": 64,
                    "width": 64,
                }
            )
            x, y = rng.integers(0, 20, 2)
            annos.append(
                {
                    "id": i,
                    "image_id": 100 + i,
                    "category_id": 7,
                    "bbox": [float(x), float(y), 20.0, 20.0],
                    "area": 400.0,
                    "iscrowd": 0,
                }
            )
        # one crowd annotation on image 0
        annos.append(
            {
                "id": 99,
                "image_id": 100,
                "category_id": 7,
                "bbox": [40.0, 40.0, 20.0, 20.0],
                "area": 400.0,
                "iscrowd": 1,
            }
        )
        with open(root / "annotations" / "instances_val2017.json", "w") as f:
            json.dump(
                {
                    "images": images,
                    "annotations": annos,
                    "categories": [{"id": 7, "name": "car"}],
                },
                f,
            )
        cfg = ExperimentConfig()
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, dataset="coco", data_dir=str(root),
                image_hw=(64, 64),
            ),
        )
        records = []
        for i, a in enumerate(annos[:4]):
            x, y, w, h = a["bbox"]
            records.append(
                {
                    "id": str(100 + i),
                    "boxes": [[x, y, x + w, y + h]],
                    "scores": [0.9],
                    "classes": [1],
                    "probs": [[0.05, 0.95]],
                    "covs": [np.eye(4).tolist()],
                }
            )
        m = evaluate(cfg, records, split="val2017", compute_pdq=False)
        assert m["coco_ap"] == pytest.approx(1.0)
        assert m["map"] == pytest.approx(1.0)
        assert m["ap_car"] == pytest.approx(1.0)
        assert "coco_ar@100" in m
