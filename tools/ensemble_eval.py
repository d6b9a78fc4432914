"""Deep-ensemble accuracy row (VERDICT r3 item 8).

The ensemble machinery (bayes.epistemic="ensemble"; infer/detector.py
member-stacked routes) is parity-tested against the dense path and has an
honest throughput number, but no ensemble had ever been TRAINED and
EVALUATED. This script closes that: train M tiny synthetic members
(identical config, different init/shuffle seeds — the canonical
deep-ensemble recipe), then emit a comparison table with

  * mc_dropout  : member 0 alone, MC-dropout epistemics (the flagship route)
  * ensemble    : M deterministic members as the sample axis
  * ensemble_mc : M members x MC dropout (factored epistemics)

CPU-friendly (tiny model, fp32); ~30 min for M=3 at 200 steps. Outputs
markdown + JSON under runs/ensemble_eval/ (committable).

  python tools/ensemble_eval.py [--members 3] [--steps 200] \
      [--out_dir runs/ensemble_eval]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_cfg():
    from bayesod_tpu.utils.config import (
        BayesConfig,
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )

    # The convergence-test recipe (tests/test_convergence.py): small enough
    # for CPU, big enough to clearly beat the random floor in 200 steps.
    return ExperimentConfig(
        name="ensemble_eval",
        model=ModelConfig(
            num_classes=3, backbone="resnet18", fpn_channels=64,
            head_depth=2, head_channels=64, norm="groupnorm",
            compute_dtype="float32", dropout_rate=0.1,
        ),
        bayes=BayesConfig(
            num_mc_samples=4, score_threshold=0.05, pre_cluster_topk=64,
            max_detections=16, mode="bayes_od",
        ),
        data=DataConfig(
            dataset="synthetic", image_hw=(128, 128), max_gt_boxes=8,
        ),
        train=TrainConfig(
            batch_size=16, optimizer="adamw", base_lr=1e-3, warmup_steps=30,
            lr_decay_steps=(10_000,), weight_decay=1e-4,
            checkpoint_every=10_000, log_every=100,
            variance_warmup_steps=40, ema_decay=0.0,
        ),
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--members", type=int, default=3)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--max_images", type=int, default=32)
    p.add_argument("--out_dir", default="runs/ensemble_eval")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # tiny model: CPU is fine

    from bayesod_tpu.cli.compare import COLUMNS, format_table
    from bayesod_tpu.eval.evaluator import evaluate, run_inference
    from bayesod_tpu.models.retinanet import stack_variables
    from bayesod_tpu.train import train

    os.makedirs(args.out_dir, exist_ok=True)
    cfg = base_cfg()

    trees = []
    for m in range(args.members):
        t0 = time.time()
        mcfg = dataclasses.replace(
            cfg,
            name=f"ensemble_eval_m{m}",
            train=dataclasses.replace(cfg.train, seed=m),
        )
        state = train(
            mcfg, max_steps=args.steps,
            out_dir=os.path.join(args.out_dir, f"member{m}"),
        )
        trees.append(state.variables())
        print(f"[ensemble] member {m}: {time.time() - t0:.0f}s", flush=True)

    rows = []
    variants = [
        ("mc_dropout", trees[0]),
        ("ensemble", stack_variables(trees)),
        ("ensemble_mc", stack_variables(trees)),
    ]
    for epistemic, variables in variants:
        run_cfg = dataclasses.replace(
            cfg, bayes=dataclasses.replace(cfg.bayes, epistemic=epistemic),
        )
        t0 = time.time()
        records = run_inference(
            run_cfg, variables, split="val",
            max_images=args.max_images, batch_size=8,
        )
        elapsed = time.time() - t0
        metrics = evaluate(run_cfg, records, split="val", min_score=0.05)
        row = {"mode": "bayes_od", "preselect": epistemic}
        row.update({k: metrics.get(k, float("nan")) for k, _ in COLUMNS})
        row["img_per_sec"] = len(records) / elapsed
        rows.append(row)
        print(f"[ensemble] {epistemic}: " + json.dumps(
            {k: round(v, 4) for k, v in row.items()
             if isinstance(v, float)}), flush=True)

    table = format_table(rows).replace("| preselect |", "| epistemic |")
    with open(os.path.join(args.out_dir, "table.md"), "w") as fh:
        fh.write(table + "\n")
    with open(os.path.join(args.out_dir, "table.json"), "w") as fh:
        json.dump(rows, fh, indent=1)
    print(table)


if __name__ == "__main__":
    main()
