"""Accuracy ablation: halving bayes.pre_cluster_topk.

DESIGN.md §8 (round 3): `--topk 256` lifts the int8 serving graph from
622.0 to 731.6 img/s (the candidate kernels' one-hot gather MACs scale
linearly in topk), but topk is an ALGORITHMIC knob — fewer candidates
reach clustering/fusion — so the speed claim needs an accuracy ablation
before the bench can default to it.

Same harness as tools/preselect_ablation.py: train the 400-step synthetic
small model once on CPU, then evaluate the SAME checkpoint through the
candidates_fused + deterministic-preselect route (the bench's route) at
topk 256 vs 128 (the kernel lane constraint makes 128 the smallest legal
value; 256 -> 128 is the same halving the flagship 512 -> 256 applies, at
4% vs 0.6% of the anchor count — a strictly HARSHER cut). Pallas kernels
run in interpret mode on CPU, so deltas are algorithmic, not hardware.

Run: python tools/topk_ablation.py [--steps 400] [--images 64]
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

from preselect_ablation import KEYS, base_cfg, variant  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--out_dir", default="/tmp/topk_ablation")
    args = p.parse_args()

    cfg = base_cfg()
    state = train(cfg, max_steps=args.steps, out_dir=args.out_dir)
    variables = state.variables()
    print(f"[ablation] trained {int(state.step)} steps", file=sys.stderr)

    results = {}
    for topk in (256, 128):
        vcfg = variant(cfg, "candidates_fused", "deterministic")
        vcfg = dataclasses.replace(
            vcfg,
            bayes=dataclasses.replace(vcfg.bayes, pre_cluster_topk=topk),
        )
        records = run_inference(
            vcfg, variables, split="val", max_images=args.images, batch_size=8
        )
        m = evaluate(vcfg, records, split="val", min_score=0.05)
        results[f"topk{topk}"] = {
            k: round(float(m[k]), 4) for k in KEYS if k in m
        }
        print(f"[ablation] topk{topk}: {results[f'topk{topk}']}",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
