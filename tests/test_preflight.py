"""Dataset preflight (data/preflight.py) against fake on-disk layouts."""

import os

import numpy as np
import pytest

from bayesod_tpu.data.preflight import (
    PreflightError,
    check_data,
    format_report,
)
from bayesod_tpu.utils.config import DataConfig


def _fake_kitti(root, n=4, bad_class=False, degenerate=False):
    import cv2

    image_dir = os.path.join(root, "training", "image_2")
    label_dir = os.path.join(root, "training", "label_2")
    os.makedirs(image_dir)
    os.makedirs(label_dir)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (96, 160, 3), dtype=np.uint8)
        cv2.imwrite(os.path.join(image_dir, f"{i:06d}.png"), img)
        cls = "Car" if not bad_class else "Car"
        box = "10.0 20.0 60.0 80.0" if not degenerate else "60.0 20.0 10.0 80.0"
        with open(os.path.join(label_dir, f"{i:06d}.txt"), "w") as f:
            f.write(f"{cls} 0.0 0 -10 {box} -1 -1 -1 -1000 -1000 -1000 -10\n")
            f.write(
                "Pedestrian 0.0 0 -10 100.0 30.0 120.0 90.0 "
                "-1 -1 -1 -1000 -1000 -1000 -10\n"
            )


def test_kitti_layout_ok(tmp_path):
    _fake_kitti(str(tmp_path))
    cfg = DataConfig(dataset="kitti", data_dir=str(tmp_path))
    reports = check_data(cfg, splits=("train",))
    (r,) = reports
    assert r["images"] == 4
    assert r["class_counts"]["car"] == 4
    assert r["class_counts"]["pedestrian"] == 4
    assert r["class_counts"]["cyclist"] == 0
    assert r["decoded_hw"] == [96, 160]
    text = format_report(reports)
    assert "4 images OK" in text
    assert "WARNING: no sampled instances of: cyclist" in text


def test_missing_root_fails(tmp_path):
    cfg = DataConfig(dataset="kitti", data_dir=str(tmp_path / "nope"))
    with pytest.raises(PreflightError, match="could not build dataset"):
        check_data(cfg, splits=("train",))


def test_degenerate_boxes_warn_not_fail(tmp_path):
    _fake_kitti(str(tmp_path), degenerate=True)
    cfg = DataConfig(dataset="kitti", data_dir=str(tmp_path))
    (r,) = check_data(cfg, splits=("train",))
    assert r["degenerate_box_ids"]  # soft problem: reported, not raised
    assert "degenerate boxes" in format_report([r])


def test_synthetic_passes():
    cfg = DataConfig(dataset="synthetic", image_hw=(128, 128))
    reports = check_data(cfg, splits=("train", "val"), sample=4)
    assert all(r["images"] > 0 for r in reports)


def test_cli_flag(tmp_path, capsys):
    _fake_kitti(str(tmp_path))
    from bayesod_tpu.cli.train import main

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        "name: preflight_test\n"
        "model: {num_classes: 3}\n"
        "data:\n"
        f"  dataset: kitti\n  data_dir: {tmp_path}\n"
        "  image_hw: [128, 256]\n"
    )
    main(["--yaml_path", str(cfg_path), "--check_data"])
    out = capsys.readouterr().out
    assert "check_data OK" in out
