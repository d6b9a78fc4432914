"""Comparison-table harness (cli/compare.py): the paper §IV artifact."""

import os

import jax
import pytest

from bayesod_tpu.cli.compare import ALL_MODES, compare_modes, format_table, main
from bayesod_tpu.models.retinanet import RetinaNet, init_variables
from bayesod_tpu.utils.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs", "tiny_synthetic.yaml")


@pytest.fixture(scope="module")
def tiny():
    cfg = load_config(CFG)
    model = RetinaNet(cfg=cfg.model, train=False)
    variables = init_variables(
        model, jax.random.PRNGKey(0), cfg.data.image_hw
    )
    return cfg, variables


def test_rows_and_table(tiny):
    cfg, variables = tiny
    rows = compare_modes(
        cfg, variables,
        modes=("bayes_od", "single_pass_nms"),
        preselects=("mc_mean", "deterministic"),
        max_images=4, batch_size=2, min_score=0.0,
    )
    # bayes_od under both preselects + one single_pass_nms row.
    assert [(r["mode"], r["preselect"]) for r in rows] == [
        ("bayes_od", "mc_mean"),
        ("bayes_od", "deterministic"),
        ("single_pass_nms", cfg.bayes.preselect_source),
    ]
    for r in rows:
        assert r["n_images"] == 4
        assert 0.0 <= r["map"] <= 1.0
        assert r["img_per_sec"] > 0.0
    table = format_table(rows)
    assert table.count("\n") == len(rows) + 1  # header + rule + rows
    assert "| mAP |" in table.splitlines()[0]


def test_high_serving_threshold_does_not_zero_the_table(tiny):
    """Regression (round-3 flagship table came back all-zero): a config
    whose SERVING score_threshold sits above the eval floor must not make
    the detector pre-filter everything — compare_modes lowers the detect
    threshold to min_score so the evaluator actually sees detections."""
    import dataclasses

    cfg, variables = tiny
    hi = dataclasses.replace(
        cfg, bayes=dataclasses.replace(cfg.bayes, score_threshold=0.9)
    )
    rows = compare_modes(
        hi, variables, modes=("bayes_od",), preselects=("mc_mean",),
        max_images=2, batch_size=2, min_score=0.0,
    )
    assert rows[0]["n_detections"] > 0, rows


def test_all_modes_listed_match_detector():
    from bayesod_tpu.infer import detector

    # Keep the harness's mode list in lock-step with the detector's.
    for m in ALL_MODES:
        assert m in detector.__doc__, m


@pytest.mark.slow
def test_cli_main(tmp_path):
    out_md = str(tmp_path / "table.md")
    out_json = str(tmp_path / "table.json")
    main([
        "--yaml_path", CFG,
        "--allow_random",
        "--modes", "nms",
        "--max_images", "2",
        "--batch_size", "2",
        "--out", out_md,
        "--json_out", out_json,
    ])
    with open(out_md) as f:
        assert f.read().startswith("| mode |")
    import json

    with open(out_json) as f:
        rows = json.load(f)
    assert rows[0]["mode"] == "nms"
