"""Paper comparison-table harness (arXiv:1903.03838 §IV; SURVEY.md:147).

The reference's experiment scripts exist to produce one artifact: the
BayesOD-vs-baselines table. This CLI runs ONE checkpoint through every
post-processing estimator (`bayes.mode`; infer/detector.py) — plus both
candidate-preselection sources for the flagship — and emits that table
(mAP, MUE, NLL, PDQ, img/s) as markdown + optional JSON.

  python -m bayesod_tpu.cli.compare --yaml_path configs/flagship_synthetic.yaml \
      [--checkpoint_dir DIR | --allow_random] [--max_images N] \
      [--modes bayes_od,nms,...] [--out TABLE.md] [--json_out TABLE.json]

Throughput note: img/s here is the END-TO-END eval rate (host decode +
normalize + device detect + D2H record marshalling) after a warmup pass that
absorbs compilation — comparable ACROSS rows, but not the device-only chained
rate bench.py reports.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

ALL_MODES = (
    "bayes_od",
    "nms",
    "single_pass_nms",
    "black_box",
    "sampling_free",
    "anchor_redundancy",
)

COLUMNS = (
    ("map", "mAP"),
    ("categorical_mue", "cat MUE"),
    ("gaussian_mue", "gauss MUE"),
    ("categorical_nll", "cat NLL"),
    ("gaussian_nll", "gauss NLL"),
    ("ece", "ECE"),
    ("pdq", "PDQ"),
    ("img_per_sec", "img/s"),
)


def compare_modes(
    cfg,
    variables,
    modes=ALL_MODES,
    preselects=("mc_mean", "deterministic"),
    split: str = "val",
    max_images=None,
    batch_size: int = 8,
    min_score: float = 0.05,
):
    """Run every (mode, preselect) variant over the split; returns row dicts.

    Only the MC clustering modes consume the preselect source in a way the
    paper distinguishes (candidate ordering feeds the fusion); the flagship
    runs under both, every other mode once under the config default.
    """
    from bayesod_tpu.eval.evaluator import evaluate, run_inference

    rows = []
    for mode in modes:
        mode_preselects = (
            preselects if mode == "bayes_od" else (cfg.bayes.preselect_source,)
        )
        for pre in mode_preselects:
            run_cfg = dataclasses.replace(
                cfg,
                bayes=dataclasses.replace(
                    cfg.bayes, mode=mode, preselect_source=pre,
                    # The evaluator sweeps score operating points down to
                    # min_score; the DETECTOR must not pre-filter above it
                    # or every mAP/PDQ row silently evaluates an empty set
                    # (a serving config like score_threshold=0.5 zeroes the
                    # whole table otherwise).
                    score_threshold=min(
                        min_score, cfg.bayes.score_threshold
                    ),
                ),
            )
            # Warmup pass: one batch through the jitted graph pays the
            # compile so the timed pass measures steady-state end-to-end.
            run_inference(
                run_cfg, variables, split=split,
                max_images=batch_size, batch_size=batch_size,
            )
            t0 = time.perf_counter()
            records = run_inference(
                run_cfg, variables, split=split,
                max_images=max_images, batch_size=batch_size,
            )
            elapsed = time.perf_counter() - t0
            metrics = evaluate(
                run_cfg, records, split=split, min_score=min_score
            )
            row = {"mode": mode, "preselect": pre}
            row.update({k: metrics.get(k, float("nan")) for k, _ in COLUMNS})
            row["img_per_sec"] = len(records) / elapsed if elapsed else 0.0
            row["n_images"] = len(records)
            row["n_detections"] = int(
                sum(len(r["scores"]) for r in records)
            )
            rows.append(row)
    return rows


def format_table(rows) -> str:
    """Markdown comparison table, flagship rows first."""
    head = ["mode", "preselect"] + [h for _, h in COLUMNS]
    lines = [
        "| " + " | ".join(head) + " |",
        "|" + "|".join("---" for _ in head) + "|",
    ]
    for r in rows:
        cells = [r["mode"], r["preselect"]]
        for key, _ in COLUMNS:
            v = r[key]
            cells.append(f"{v:.4f}" if v == v else "—")
        lines.append("| " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--min_score", type=float, default=0.05)
    p.add_argument(
        "--modes", default=",".join(ALL_MODES),
        help="comma-separated subset of: " + ", ".join(ALL_MODES),
    )
    p.add_argument(
        "--preselect", default="mc_mean,deterministic",
        help="comma-separated preselect sources for the bayes_od rows",
    )
    p.add_argument(
        "--allow_random", action="store_true",
        help="run with random-init weights when no checkpoint exists",
    )
    p.add_argument(
        "--weights_npz", default=None,
        help="serving-weights archive (tools/export_weights.py) instead "
        "of an Orbax checkpoint dir",
    )
    p.add_argument("--ema", action="store_true")
    p.add_argument(
        "--quantize", action="store_true",
        help="run the requested modes through the full int8-resident "
        "serving graph (backbone/FPN/trunks PTQ-calibrated on the split's "
        "first images — models/calibration.py); the flagship-scale "
        "accuracy check for the production quantized operating point",
    )
    p.add_argument(
        "--calib_images", type=int, default=8,
        help="calibration batch size for --quantize",
    )
    p.add_argument("--out", default=None, help="write the markdown table here")
    p.add_argument("--json_out", default=None)
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from bayesod_tpu.utils.config import load_config, parse_override

    overrides = dict(parse_override(o) for o in args.overrides)
    cfg = load_config(args.yaml_path, overrides)

    from bayesod_tpu.models.retinanet import RetinaNet
    from bayesod_tpu.train import restore_state

    model = RetinaNet(cfg=cfg.model, train=False)
    try:
        state = restore_state(
            cfg, args.checkpoint_dir, model=model,
            missing_ok=args.allow_random, weights_npz=args.weights_npz,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"{e} (use --allow_random for smoke runs)")
    variables = state.variables(use_ema=args.ema)

    if args.quantize:
        import jax.numpy as jnp
        import numpy as np

        from bayesod_tpu.data import make_dataset, normalize_images
        from bayesod_tpu.models.calibration import quantized_serving_config

        ds = make_dataset(cfg.data, split=args.split)
        calib = np.stack(
            [
                ds.example(i)["image"]
                for i in range(min(args.calib_images, len(ds)))
            ]
        )
        cfg = quantized_serving_config(
            cfg, variables,
            normalize_images(
                jnp.asarray(calib), cfg.data.mean, cfg.data.std
            ),
        )
        print("[compare] int8-resident serving graph (PTQ-calibrated)")

    if (
        cfg.model.head_table_dtype != "bf16"
        and not cfg.model.head_table_scales
    ):
        # A `model.head_table_dtype=int8` override has no scales in the
        # YAML — calibrate on a small split batch so knob ablations run
        # from one command line.
        import jax.numpy as jnp

        from bayesod_tpu.data import make_dataset, normalize_images
        from bayesod_tpu.models.calibration import calibrate_serving_scales

        import numpy as np

        ds = make_dataset(cfg.data, split=args.split)
        calib = np.stack(
            [ds.example(i)["image"] for i in range(min(4, len(ds)))]
        )
        _, _, _, table_scales = calibrate_serving_scales(
            cfg, variables,
            normalize_images(
                jnp.asarray(calib), cfg.data.mean, cfg.data.std
            ),
        )
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, head_table_scales=table_scales
            ),
        )
        print(f"[compare] calibrated table scales: {table_scales}")

    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    unknown = set(modes) - set(ALL_MODES)
    if unknown:
        raise SystemExit(f"unknown modes: {sorted(unknown)}")
    rows = compare_modes(
        cfg, variables,
        modes=modes,
        preselects=tuple(
            s.strip() for s in args.preselect.split(",") if s.strip()
        ),
        split=args.split,
        max_images=args.max_images,
        batch_size=args.batch_size,
        min_score=args.min_score,
    )
    table = format_table(rows)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
