"""Accuracy ablation: int8-RESIDENT backbone vs bf16 on a trained model.

Same protocol as tools/preselect_ablation.py (synthetic 400-step model, the
round-1 learning check), but with norm=batchnorm (int8_resident folds BN
statically) and comparing backbone execution:

  bf16           — exact backbone (the training path)
  int8_resident  — calibrated int8-in-HBM backbone, SAME checkpoint

Both variants use identical serving routes, so the metric deltas isolate
the quantization. Results recorded in DESIGN.md §8.

Run: python tools/int8_ablation.py [--steps 400] [--images 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from bayesod_tpu.data import Loader, make_dataset, normalize_images  # noqa: E402
from bayesod_tpu.eval.evaluator import evaluate, run_inference  # noqa: E402
from bayesod_tpu.models.calibration import (  # noqa: E402
    quantized_serving_config,
    with_int8_resident_backbone,
)
from bayesod_tpu.train import train  # noqa: E402
from bayesod_tpu.utils.config import (  # noqa: E402
    BayesConfig,
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)

KEYS = (
    "map", "ap_red", "ap_green", "ap_blue", "categorical_mue", "pdq",
    "mean_entropy_tp", "mean_entropy_fp", "gaussian_nll", "categorical_nll",
)


def base_cfg() -> ExperimentConfig:
    return ExperimentConfig(
        name="int8_ablation",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=64,
            head_depth=2, head_channels=64, norm="batchnorm",
            compute_dtype="float32", dropout_rate=0.1,
        ),
        bayes=BayesConfig(
            num_mc_samples=10, score_threshold=0.05,
            pre_cluster_topk=128, max_detections=16, mode="bayes_od",
            approx_topk=False,
        ),
        data=DataConfig(
            dataset="synthetic", image_hw=(128, 128), max_gt_boxes=8
        ),
        train=TrainConfig(
            batch_size=16, optimizer="adamw", base_lr=1e-3, warmup_steps=30,
            total_steps=400, lr_decay_steps=(300,), weight_decay=1e-4,
            checkpoint_every=400, log_every=50, variance_warmup_steps=100,
        ),
        mesh=MeshConfig(data_parallel=1, sample_parallel=1),
    )


def calibration_batch(cfg, n: int = 16) -> jnp.ndarray:
    ds = make_dataset(cfg.data, split="val")
    loader = Loader(
        ds, batch_size=n, image_hw=cfg.data.image_hw, shuffle=False,
        num_epochs=1, num_workers=1,
    )
    batch = next(iter(loader))
    return normalize_images(
        jnp.asarray(batch["image"]), cfg.data.mean, cfg.data.std
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--out_dir", default="/tmp/int8_ablation")
    args = p.parse_args()

    cfg = base_cfg()
    state = train(cfg, max_steps=args.steps, out_dir=args.out_dir)
    variables = state.variables()
    print(f"[ablation] trained {int(state.step)} steps", file=sys.stderr)

    calib = calibration_batch(cfg)
    cfg8 = with_int8_resident_backbone(cfg, variables, calib)
    cfg8_full = quantized_serving_config(cfg, variables, calib)
    print(
        f"[ablation] calibrated {len(cfg8.model.backbone_act_scales)} "
        f"backbone + {len(cfg8_full.model.head_trunk_act_scales)} trunk "
        "sites",
        file=sys.stderr,
    )

    results = {}
    for tag, vcfg in {
        "bf16": cfg,
        "int8_resident": cfg8,
        "int8_resident_full": cfg8_full,  # backbone + FPN + head trunks
    }.items():
        records = run_inference(
            vcfg, variables, split="val", max_images=args.images, batch_size=8
        )
        m = evaluate(vcfg, records, split="val", min_score=0.05)
        results[tag] = {k: round(float(m[k]), 4) for k in KEYS if k in m}
        print(f"[ablation] {tag}: {results[tag]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
