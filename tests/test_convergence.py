"""End-to-end learning smoke: train on synthetic, verify detection quality
and uncertainty separation emerge (SURVEY.md §4 — the reference's only
verification was empirical end-to-end; this is the CI-sized equivalent).

A full run (400 steps, CPU) reaches mAP ~0.70 with categorical MUE ~0.05;
this reduced version asserts the direction, not the ceiling.
"""

import shutil

import jax
import numpy as np
import pytest

from bayesod_tpu.eval.evaluator import evaluate, run_inference
from bayesod_tpu.train import train
from bayesod_tpu.utils.config import (
    BayesConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)


@pytest.mark.slow
def test_training_learns_detection_and_uncertainty(tmp_path):
    cfg = ExperimentConfig(
        name="conv_smoke",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=64,
            head_depth=2, head_channels=64, norm="groupnorm",
            compute_dtype="float32", dropout_rate=0.1,
        ),
        bayes=BayesConfig(
            num_mc_samples=4, score_threshold=0.05, pre_cluster_topk=64,
            max_detections=16, mode="bayes_od",
        ),
        data=DataConfig(dataset="synthetic", image_hw=(128, 128), max_gt_boxes=8),
        train=TrainConfig(
            batch_size=16, optimizer="adamw", base_lr=1e-3, warmup_steps=30,
            total_steps=150, lr_decay_steps=(10_000,), weight_decay=1e-4,
            checkpoint_every=10_000, log_every=50,
            # 150-step run: ramp attenuation in fast so the variance head
            # still trains (default 2000-step warmup would keep w <= 0.075).
            variance_warmup_steps=40,
        ),
    )
    state = train(cfg, max_steps=150, out_dir=str(tmp_path / "run"))
    records = run_inference(
        cfg, state.variables(), split="val", max_images=16, batch_size=8
    )
    metrics = evaluate(cfg, records, split="val", min_score=0.05)
    # Random weights give mAP ~0 and MUE ~0.5; learning must clearly beat both.
    assert metrics["map"] > 0.15, metrics
    assert metrics["categorical_mue"] < 0.45, metrics
    # Correct detections should carry less entropy than false positives.
    assert metrics["mean_entropy_tp"] < metrics["mean_entropy_fp"], metrics
    # Probabilistic detection quality must clear the random-weights floor
    # (~0; a 400-step run reaches ~0.43 with avg TP pPDQ ~0.69).
    assert metrics["pdq"] > 0.02, metrics
