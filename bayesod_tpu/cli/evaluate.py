"""Evaluation CLI — counterpart of the reference's offline eval scripts
(SURVEY.md §3.3): scores a dumped detections JSONL against the dataset's GT.

  python -m bayesod_tpu.cli.evaluate --yaml_path configs/retinanet_kitti.yaml \
      --detections data/outputs/<name>/detections_val.jsonl [--split val]

Prints a metric table: per-class AP (KITTI difficulty bins when
data.dataset=kitti), mAP, MUE (categorical + Gaussian), NLLs, entropies.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--detections", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--min_score", type=float, default=0.05)
    p.add_argument("--iou_threshold", type=float, default=0.5)
    p.add_argument("--json_out", default=None)
    p.add_argument(
        "--model_dataset", default=None,
        choices=["kitti", "bdd", "synthetic"],
        help="dataset whose class list the DUMPING model was trained on, "
        "when it differs from the eval dataset (cross-dataset evaluation, "
        "paper §IV — e.g. a BDD-trained model scored on KITTI GT); "
        "detections are remapped by class name (person<->pedestrian, "
        "rider<->cyclist aliases built in)",
    )
    p.add_argument(
        "--class_alias", action="append", default=[],
        metavar="MODEL:EVAL",
        help="extra model->eval class-name alias (repeatable)",
    )
    p.add_argument(
        "--plots", default=None, metavar="DIR",
        help="also write diagnostic PNGs (per-class PR curves, reliability "
        "diagram, TP/FP entropy separation — eval/plots.py)",
    )
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from bayesod_tpu.utils.config import load_config, parse_override

    overrides = dict(parse_override(o) for o in args.overrides)
    cfg = load_config(args.yaml_path, overrides)

    from bayesod_tpu.eval.evaluator import evaluate

    with open(args.detections) as f:
        records = [json.loads(line) for line in f if line.strip()]

    model_class_names = None
    if args.model_dataset:
        from bayesod_tpu.data.bdd import BDD_CLASSES
        from bayesod_tpu.data.kitti import KITTI_CLASSES
        from bayesod_tpu.data.synthetic import SYNTHETIC_CLASSES

        model_class_names = {
            "kitti": KITTI_CLASSES,
            "bdd": BDD_CLASSES,
            "synthetic": SYNTHETIC_CLASSES,
        }[args.model_dataset]
    aliases = dict(a.split(":", 1) for a in args.class_alias)

    metrics = evaluate(
        cfg,
        records,
        split=args.split,
        min_score=args.min_score,
        iou_threshold=args.iou_threshold,
        model_class_names=model_class_names,
        class_aliases=aliases or None,
        plots_dir=args.plots,
    )
    if args.plots:
        print(f"diagnostic plots written to {args.plots}")
    width = max(len(k) for k in metrics)
    for k in sorted(metrics):
        print(f"{k:<{width}}  {metrics[k]:.4f}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
