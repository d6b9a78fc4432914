"""Accuracy ablation: deterministic vs MC-mean candidate preselection.

VERDICT r1 item 2: the deterministic-preselect route is 1039.8 img/s vs
799.8 (2.08x vs 1.60x target) but its accuracy cost was unquantified. This
script trains the synthetic 400-step model (the round-1 learning check) and
evaluates the SAME checkpoint through three routes:

  dense      — reg_finals=dense (XLA finals), preselect on MC-mean (oracle)
  fused_mc   — candidates_fused kernels, preselect on MC-mean
  fused_det  — candidates_fused kernels, preselect on one dropout-off pass

On CPU the Pallas kernels run in interpret mode — numerically the same
program, so metric deltas are algorithmic (candidate ordering), not
hardware noise. Results recorded in DESIGN.md "deterministic preselect".

Run: python tools/preselect_ablation.py [--steps 400] [--images 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from bayesod_tpu.eval.evaluator import evaluate, run_inference  # noqa: E402
from bayesod_tpu.train import train  # noqa: E402
from bayesod_tpu.utils.config import (  # noqa: E402
    BayesConfig,
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)


def base_cfg() -> ExperimentConfig:
    return ExperimentConfig(
        name="preselect_ablation",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=64,
            head_depth=2, head_channels=64, norm="groupnorm",
            compute_dtype="float32", dropout_rate=0.1,
        ),
        bayes=BayesConfig(
            num_mc_samples=10, score_threshold=0.05,
            pre_cluster_topk=128,  # kernel lane constraint: multiple of 128
            max_detections=16, mode="bayes_od", approx_topk=False,
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


def variant(cfg, reg_finals: str, preselect: str) -> ExperimentConfig:
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            reg_finals=reg_finals,
            head_final_backend="pallas" if reg_finals != "dense" else "auto",
        ),
        bayes=dataclasses.replace(cfg.bayes, preselect_source=preselect),
    )


KEYS = (
    "map", "ap_red", "ap_green", "ap_blue", "categorical_mue", "pdq",
    "mean_entropy_tp", "mean_entropy_fp", "gaussian_nll", "categorical_nll",
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--out_dir", default="/tmp/preselect_ablation")
    args = p.parse_args()

    cfg = base_cfg()
    state = train(cfg, max_steps=args.steps, out_dir=args.out_dir)
    variables = state.variables()
    print(f"[ablation] trained {int(state.step)} steps", file=sys.stderr)

    results = {}
    for tag, (rf, ps) in {
        "dense": ("dense", "mc_mean"),
        "fused_mc": ("candidates_fused", "mc_mean"),
        "fused_det": ("candidates_fused", "deterministic"),
    }.items():
        vcfg = variant(cfg, rf, ps)
        records = run_inference(
            vcfg, variables, split="val", max_images=args.images, batch_size=8
        )
        m = evaluate(vcfg, records, split="val", min_score=0.05)
        results[tag] = {k: round(float(m[k]), 4) for k in KEYS if k in m}
        print(f"[ablation] {tag}: {results[tag]}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
