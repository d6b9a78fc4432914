"""Data pipeline tests: parsers on golden fixture files, preprocessing math,
loader batching (SURVEY.md §4 golden-file strategy)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesod_tpu.data import (
    Loader,
    normalize_images,
    pad_gt,
    prepare_example,
    random_flip_batch,
    resize_and_pad,
)
from bayesod_tpu.data.kitti import (
    DIFFICULTY_GATES,
    KittiDataset,
    parse_label_file,
)
from bayesod_tpu.data.bdd import BddDataset
from bayesod_tpu.data.coco import CocoDataset
from bayesod_tpu.data.synthetic import SyntheticDataset

KITTI_LABEL = """\
Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59
Van 0.00 2 1.85 387.63 181.54 423.81 203.12 1.67 1.87 3.69 -16.53 2.39 58.49 1.57
Pedestrian 0.80 1 -1.60 100.00 150.00 120.00 250.00 1.75 0.60 0.90 2.00 1.60 13.00 -1.55
DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10
Cyclist 0.00 0 -2.00 200.00 160.00 240.00 230.00 1.70 0.60 1.80 -5.00 1.70 20.00 -2.10
"""


@pytest.fixture
def kitti_root(tmp_path):
    root = tmp_path / "kitti"
    (root / "training" / "image_2").mkdir(parents=True)
    (root / "training" / "label_2").mkdir(parents=True)
    from PIL import Image

    for i in range(3):
        Image.new("RGB", (1242, 375), (i * 30, 100, 50)).save(
            root / "training" / "image_2" / f"{i:06d}.png"
        )
        (root / "training" / "label_2" / f"{i:06d}.txt").write_text(KITTI_LABEL)
    return str(root)


class TestKitti:
    def test_parse_label_file(self, tmp_path):
        p = tmp_path / "000000.txt"
        p.write_text(KITTI_LABEL)
        annos = parse_label_file(str(p))
        assert len(annos) == 5
        # Car=1, Van->1, Pedestrian=2, DontCare->0, Cyclist=3
        assert [a.class_id for a in annos] == [1, 1, 2, 0, 3]
        np.testing.assert_allclose(
            annos[0].box, [587.01, 173.33, 614.12, 200.12], atol=1e-4
        )

    def test_dataset_example(self, kitti_root):
        ds = KittiDataset(kitti_root)
        assert len(ds) == 3
        ex = ds.example(0)
        assert ex["image"].shape == (375, 1242, 3)
        assert ex["boxes"].shape == (4, 4)  # DontCare dropped
        assert list(ex["classes"]) == [1, 1, 2, 3]

    def test_difficulty_gates(self, tmp_path):
        p = tmp_path / "x.txt"
        p.write_text(KITTI_LABEL)
        annos = parse_label_file(str(p))
        car = annos[0]  # height 26.8 -> moderate+hard only
        assert not car.difficulty_ok("easy")
        assert car.difficulty_ok("moderate") and car.difficulty_ok("hard")
        ped = annos[2]  # height 100 but trunc 0.8 -> fails all
        assert not ped.difficulty_ok("hard")

    def test_split_file(self, kitti_root):
        with open(os.path.join(kitti_root, "val.txt"), "w") as f:
            f.write("000001\n")
        ds = KittiDataset(kitti_root, split="val")
        assert len(ds) == 1 and ds.ids == ["000001"]


class TestBdd:
    def test_parse(self, tmp_path):
        root = tmp_path / "bdd"
        (root / "labels").mkdir(parents=True)
        (root / "images" / "100k" / "val").mkdir(parents=True)
        records = [
            {
                "name": "img0.jpg",
                "labels": [
                    {
                        "category": "car",
                        "box2d": {"x1": 10, "y1": 20, "x2": 110, "y2": 90},
                    },
                    {"category": "drivable area"},  # no box2d -> skipped
                    {
                        "category": "traffic sign",
                        "box2d": {"x1": 5, "y1": 5, "x2": 25, "y2": 25},
                    },
                ],
            }
        ]
        with open(root / "labels" / "bdd100k_labels_images_val.json", "w") as f:
            json.dump(records, f)
        from PIL import Image

        Image.new("RGB", (1280, 720)).save(root / "images" / "100k" / "val" / "img0.jpg")
        ds = BddDataset(str(root), "val")
        assert len(ds) == 1 and ds.num_classes == 10
        ex = ds.example(0)
        assert ex["image"].shape == (720, 1280, 3)
        assert ex["boxes"].shape == (2, 4)
        assert list(ex["classes"]) == [1, 9]  # car=1, traffic sign=9


class TestCoco:
    def test_parse(self, tmp_path):
        root = tmp_path / "coco"
        (root / "annotations").mkdir(parents=True)
        (root / "val2017").mkdir(parents=True)
        raw = {
            "categories": [{"id": 3, "name": "car"}, {"id": 1, "name": "person"}],
            "images": [{"id": 7, "file_name": "a.jpg", "width": 64, "height": 48}],
            "annotations": [
                {"image_id": 7, "category_id": 3, "bbox": [10, 10, 20, 15], "iscrowd": 0},
                {"image_id": 7, "category_id": 1, "bbox": [0, 0, 5, 5], "iscrowd": 1},
            ],
        }
        with open(root / "annotations" / "instances_val2017.json", "w") as f:
            json.dump(raw, f)
        from PIL import Image

        Image.new("RGB", (64, 48)).save(root / "val2017" / "a.jpg")
        ds = CocoDataset(str(root), "val2017")
        ex = ds.example(0)
        assert ex["boxes"].shape == (1, 4)  # crowd dropped
        np.testing.assert_allclose(ex["boxes"][0], [10, 10, 30, 25])
        # category id 3 (car) remaps to contiguous 2 (person=1 sorts first).
        assert list(ex["classes"]) == [2]

    def test_ground_truth_crowds_and_areas(self, tmp_path):
        root = tmp_path / "coco"
        (root / "annotations").mkdir(parents=True)
        raw = {
            "categories": [{"id": 3, "name": "car"}],
            "images": [{"id": 7, "file_name": "a.jpg", "width": 64, "height": 48}],
            "annotations": [
                {"image_id": 7, "category_id": 3, "bbox": [10, 10, 20, 15],
                 "area": 123.0, "iscrowd": 0},
                {"image_id": 7, "category_id": 3, "bbox": [0, 0, 5, 5],
                 "iscrowd": 1},
            ],
        }
        with open(root / "annotations" / "instances_val2017.json", "w") as f:
            json.dump(raw, f)
        gt = CocoDataset(str(root), "val2017").ground_truth(0)
        assert gt["hw"] == (48, 64)
        np.testing.assert_allclose(gt["areas"], [123.0])  # seg area, not box
        np.testing.assert_allclose(gt["crowd_boxes"], [[0, 0, 5, 5]])
        assert list(gt["crowd_classes"]) == [1]

    def test_results_writer_unmaps_category_ids(self, tmp_path):
        from bayesod_tpu.data.coco import write_coco_results

        root = tmp_path / "coco"
        (root / "annotations").mkdir(parents=True)
        raw = {
            "categories": [{"id": 3, "name": "car"}, {"id": 1, "name": "person"}],
            "images": [{"id": 7, "file_name": "a.jpg", "width": 64, "height": 48}],
            "annotations": [],
        }
        with open(root / "annotations" / "instances_val2017.json", "w") as f:
            json.dump(raw, f)
        ds = CocoDataset(str(root), "val2017")
        records = [
            {
                "id": "7",
                "boxes": [[10.0, 10.0, 30.0, 25.0], [0.0, 0.0, 5.0, 5.0]],
                "scores": [0.9, 0.2],
                "classes": [2, 1],  # contiguous: car=2, person=1
            }
        ]
        path = write_coco_results(
            records, ds, str(tmp_path / "res.json"), score_threshold=0.5
        )
        out = json.load(open(path))
        # low-score det filtered; contiguous 2 unmapped to sparse id 3
        assert out == [
            {
                "image_id": 7,
                "category_id": 3,
                "bbox": [10.0, 10.0, 20.0, 15.0],
                "score": 0.9,
            }
        ]


class TestPreprocess:
    def test_resize_and_pad_scales_boxes(self):
        img = np.zeros((100, 200, 3), np.uint8)
        boxes = np.array([[0, 0, 200, 100]], np.float32)
        out, b, scale = resize_and_pad(img, boxes, (64, 64))
        assert out.shape == (64, 64, 3)
        assert scale == pytest.approx(0.32)
        np.testing.assert_allclose(b[0], [0, 0, 64, 32], atol=1e-4)

    def test_pad_gt_truncates(self):
        boxes = np.ones((5, 4), np.float32)
        classes = np.arange(1, 6, dtype=np.int32)
        rec = pad_gt(boxes, classes, 3)
        assert rec["gt_boxes"].shape == (3, 4)
        assert rec["gt_valid"].all()
        rec2 = pad_gt(boxes[:1], classes[:1], 3)
        assert rec2["gt_valid"].tolist() == [True, False, False]

    def test_normalize(self):
        img = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
        out = normalize_images(img, mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
        np.testing.assert_allclose(np.array(out), 1.0, atol=1e-6)

    def test_random_flip_consistency(self):
        """Flipped boxes must land on the flipped pixels."""
        rng = jax.random.PRNGKey(0)
        img = jnp.zeros((4, 8, 16, 1), jnp.float32)
        img = img.at[:, 2:6, 3:9, :].set(1.0)  # box x in [3, 9)
        boxes = jnp.tile(jnp.array([[[3.0, 2.0, 9.0, 6.0]]]), (4, 1, 1))
        valid = jnp.ones((4, 1), bool)
        fi, fb = random_flip_batch(rng, img, boxes, valid)
        for i in range(4):
            x1, y1, x2, y2 = [float(v) for v in fb[i, 0]]
            inside = fi[i, int(y1) : int(y2), int(x1) : int(x2), 0]
            assert float(jnp.mean(inside)) == 1.0
        # Some images flip, some don't, across a batch of 4 (p=1/16 to fail).
        flipped = [bool(jnp.any(fb[i, 0] != boxes[i, 0])) for i in range(4)]
        assert any(flipped)

    def test_photometric_jitter(self):
        from bayesod_tpu.data.preprocess import photometric_jitter_batch

        rng = jax.random.PRNGKey(3)
        img = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (4, 8, 8, 3), np.uint8)
        )
        out = photometric_jitter_batch(rng, img)
        out_np = np.asarray(out)
        # bounds + dtype
        assert out.dtype == jnp.float32
        assert out_np.min() >= 0.0 and out_np.max() <= 255.0
        # actually perturbs, and per-image factors differ
        d = np.abs(out_np - np.asarray(img, np.float32)).mean(axis=(1, 2, 3))
        assert (d > 0).all()
        assert np.std(d) > 0
        # deterministic in the key
        out2 = photometric_jitter_batch(rng, img)
        np.testing.assert_array_equal(out_np, np.asarray(out2))
        # identity at zero strengths
        ident = photometric_jitter_batch(
            rng, img, brightness=0.0, contrast=0.0, saturation=0.0
        )
        np.testing.assert_allclose(
            np.asarray(ident), np.asarray(img, np.float32), atol=1e-3
        )

    def test_scale_jitter_identity_at_one(self):
        from bayesod_tpu.data.preprocess import random_scale_jitter_batch

        img = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (2, 16, 32, 3), np.uint8)
        )
        boxes = jnp.tile(jnp.asarray([[[4.0, 2.0, 20.0, 10.0]]]), (2, 1, 1))
        valid = jnp.ones((2, 1), bool)
        out, b, v = random_scale_jitter_batch(
            jax.random.PRNGKey(0), img, boxes, valid,
            min_scale=1.0, max_scale=1.0,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(img, np.float32), atol=1e-3
        )
        np.testing.assert_allclose(np.asarray(b), np.asarray(boxes), atol=1e-4)
        assert np.asarray(v).all()

    def test_scale_jitter_boxes_track_pixels(self):
        """At a fixed zoom the box must land on the moved pixel mass."""
        from bayesod_tpu.data.preprocess import random_scale_jitter_batch

        img = jnp.zeros((4, 16, 32, 1), jnp.float32)
        img = img.at[:, 4:12, 8:24, :].set(1.0)
        boxes = jnp.tile(jnp.asarray([[[8.0, 4.0, 24.0, 12.0]]]), (4, 1, 1))
        valid = jnp.ones((4, 1), bool)
        out, b, v = random_scale_jitter_batch(
            jax.random.PRNGKey(1), img, boxes, valid,
            min_scale=0.5, max_scale=0.5, min_visible=2.0,
        )
        assert np.asarray(v).all()
        for i in range(4):
            x1, y1, x2, y2 = [float(q) for q in b[i, 0]]
            inside = np.asarray(out)[i, round(y1) + 1 : round(y2) - 1,
                                     round(x1) + 1 : round(x2) - 1, 0]
            assert inside.mean() > 0.9, (i, inside.mean())
            # sanity: box area shrank 4x
            assert (x2 - x1) == pytest.approx(8.0, abs=0.1)

    def test_scale_jitter_invalidates_offscreen(self):
        from bayesod_tpu.data.preprocess import random_scale_jitter_batch

        img = jnp.zeros((1, 16, 32, 1), jnp.float32)
        # tiny box near the left edge; zoom-in 2x with a crop window biased
        # right can push it out — force that with a deterministic key sweep.
        boxes = jnp.asarray([[[0.0, 0.0, 3.0, 3.0]]])
        valid = jnp.ones((1, 1), bool)
        invalidated = False
        for seed in range(8):
            _, b, v = random_scale_jitter_batch(
                jax.random.PRNGKey(seed), img, boxes, valid,
                min_scale=2.0, max_scale=2.0, min_visible=4.0,
            )
            if not bool(np.asarray(v)[0, 0]):
                invalidated = True
                np.testing.assert_array_equal(np.asarray(b)[0, 0], 0.0)
        assert invalidated

    def test_photometric_in_train_step(self):
        """augment_photometric=True runs inside the jit train step and leaves
        GT semantics alone (loss finite, state advances)."""
        import dataclasses

        from bayesod_tpu.models.retinanet import RetinaNet
        from bayesod_tpu.ops import anchors as anchor_ops
        from bayesod_tpu.train import build_train_step, create_train_state
        from tests.test_train import make_batch, tiny_cfg

        cfg = tiny_cfg()
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, augment_photometric=True, augment_scale=(0.8, 1.2)
            ),
        )
        model = RetinaNet(cfg=cfg.model, train=True)
        anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
        state = create_train_state(
            model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
        )
        step = jax.jit(build_train_step(cfg, anchors, model))
        state, metrics = step(state, make_batch(cfg))
        assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 1


class TestLoaderAndSynthetic:
    def test_synthetic_deterministic(self):
        ds = SyntheticDataset(size=4, image_hw=(64, 64))
        e1, e2 = ds.example(2), ds.example(2)
        np.testing.assert_array_equal(e1["image"], e2["image"])
        assert e1["boxes"].shape[0] >= 1

    def test_loader_shapes_and_epoch(self):
        ds = SyntheticDataset(size=10, image_hw=(64, 64))
        loader = Loader(
            ds, batch_size=4, image_hw=(64, 64), max_gt_boxes=8,
            num_epochs=1, num_workers=2,
        )
        batches = list(loader)
        assert len(batches) == 2  # 10 // 4, remainder dropped
        b = batches[0]
        assert b["image"].shape == (4, 64, 64, 3) and b["image"].dtype == np.uint8
        assert b["gt_boxes"].shape == (4, 8, 4)
        assert b["gt_classes"].shape == (4, 8)
        assert b["gt_valid"].shape == (4, 8)

    def test_loader_cache_identical_and_hits(self):
        """cache=True (DataConfig.cache_examples) must be semantically
        invisible — identical batches to the uncached loader — and must
        stop re-preparing examples after the first epoch."""
        calls = []

        class Counting(SyntheticDataset):
            def example(self, index):
                calls.append(index)
                return super().example(index)

        ds = Counting(size=6, image_hw=(32, 32))
        mk = lambda cache: Loader(
            ds, batch_size=3, image_hw=(32, 32), num_epochs=2, seed=1,
            num_workers=2, cache=cache,
        )
        plain = [b["image"] for b in mk(False)]
        calls.clear()
        cached = [b["image"] for b in mk(True)]
        for x, y in zip(plain, cached):
            np.testing.assert_array_equal(x, y)
        # 2 epochs x 6 examples, but each index prepared only once.
        assert len(calls) == 6

    def test_loader_host_shards_disjoint_and_cover(self):
        """Multi-host input sharding (shard_index/shard_count): every
        simulated process computes the same seeded global order and takes a
        strided slice — shards are disjoint, their union is the epoch, and
        each host's batches are locally full-shape."""

        class Tagged(SyntheticDataset):
            def example(self, index):
                ex = super().example(index)
                ex["image"] = ex["image"].copy()
                ex["image"][0, 0, 0] = index  # recover the index from pixels
                return ex

        ds = Tagged(size=16, image_hw=(32, 32))
        seen = []
        for host in range(4):
            loader = Loader(
                ds, batch_size=2, image_hw=(32, 32), num_epochs=1, seed=5,
                num_workers=1, shard_index=host, shard_count=4,
            )
            assert loader.steps_per_epoch() == 2
            ids = [
                int(b["image"][i, 0, 0, 0])
                for b in loader
                for i in range(b["image"].shape[0])
            ]
            assert len(ids) == 4  # 16/4 per host
            seen.append(set(ids))
        union = set().union(*seen)
        assert union == set(range(16))
        assert sum(len(s) for s in seen) == len(union)  # disjoint

    def test_loader_shard_validation(self):
        ds = SyntheticDataset(size=4, image_hw=(32, 32))
        with pytest.raises(ValueError, match="shard_index"):
            Loader(
                ds, batch_size=2, image_hw=(32, 32), shard_index=2,
                shard_count=2,
            )

    def test_loader_shuffle_reproducible(self):
        ds = SyntheticDataset(size=8, image_hw=(32, 32))
        mk = lambda: Loader(
            ds, batch_size=4, image_hw=(32, 32), num_epochs=1, seed=3,
            num_workers=1,
        )
        b1 = [b["image"] for b in mk()]
        b2 = [b["image"] for b in mk()]
        for x, y in zip(b1, b2):
            np.testing.assert_array_equal(x, y)


class TestKittiResultsWriter:
    def test_roundtrip_through_parser(self, tmp_path):
        """Dumped results must re-parse with the same classes and boxes."""
        from bayesod_tpu.data.kitti import (
            KittiDataset,
            parse_label_file,
            write_kitti_results,
        )

        records = [
            {
                "id": "000042",
                "boxes": [[10.0, 20.0, 110.5, 90.25], [5.0, 5.0, 25.0, 45.0]],
                "classes": [1, 3],
                "scores": [0.91, 0.33],
            }
        ]
        out = write_kitti_results(records, None, str(tmp_path / "res"))
        annos = parse_label_file(str(tmp_path / "res" / "000042.txt"))
        assert [a.class_id for a in annos] == [1, 3]
        np.testing.assert_allclose(annos[0].box, [10, 20, 110.5, 90.25])
        # score is the 16th field
        line = open(tmp_path / "res" / "000042.txt").readline().split()
        assert len(line) == 16 and float(line[15]) == pytest.approx(0.91)

    def test_threshold_filters(self, tmp_path):
        from bayesod_tpu.data.kitti import write_kitti_results

        records = [
            {"id": "0", "boxes": [[0, 0, 1, 1]], "classes": [1], "scores": [0.1]}
        ]
        write_kitti_results(records, None, str(tmp_path / "r"), score_threshold=0.5)
        assert open(tmp_path / "r" / "0.txt").read() == ""


def test_write_bdd_results(tmp_path):
    """Official BDD submission JSON: name/labels/category/box2d/score schema,
    score gating, class-id -> category mapping (VERDICT r1 missing item 6)."""
    import json

    from bayesod_tpu.data.bdd import BDD_CLASSES, write_bdd_results

    records = [
        {
            "id": "frame_a",
            "boxes": [[1.0, 2.0, 30.0, 40.0], [5.0, 5.0, 10.0, 10.0]],
            "classes": [1, 4],
            "scores": [0.9, 0.05],
        },
        {"id": "frame_b", "boxes": [], "classes": [], "scores": []},
    ]
    out = write_bdd_results(
        records, str(tmp_path / "det.json"), score_threshold=0.1
    )
    data = json.load(open(out))
    assert [d["name"] for d in data] == ["frame_a.jpg", "frame_b.jpg"]
    labels = data[0]["labels"]
    assert len(labels) == 1  # the 0.05 detection is gated out
    assert labels[0]["category"] == BDD_CLASSES[0]
    assert labels[0]["box2d"] == {"x1": 1.0, "y1": 2.0, "x2": 30.0, "y2": 40.0}
    assert abs(labels[0]["score"] - 0.9) < 1e-6
    assert data[1]["labels"] == []
