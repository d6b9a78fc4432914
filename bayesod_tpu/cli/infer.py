"""Inference CLI — counterpart of the reference's run_inference.py
(ref: src/retina_net/experiments/run_inference.py; SURVEY.md §3.2).

  python -m bayesod_tpu.cli.infer --yaml_path configs/retinanet_kitti.yaml \
      [--split val] [--checkpoint_dir DIR] [--out PATH.jsonl] \
      [--max_images N] [section.key=value ...]

Loads the latest checkpoint (or random-init weights with --allow_random for
smoke runs), runs the jitted BayesOD pipeline over the split, dumps per-image
detection records (boxes in original coordinates, class distributions, 4x4
covariances, entropies) as JSONL.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--split", default="val")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument(
        "--allow_random", action="store_true",
        help="run with random-init weights when no checkpoint exists",
    )
    p.add_argument(
        "--weights_npz", default=None,
        help="serving-weights archive (tools/export_weights.py) instead "
        "of an Orbax checkpoint dir (takes precedence: --checkpoint_dir "
        "and --allow_random are ignored when this is given)",
    )
    p.add_argument(
        "--ema", action="store_true",
        help="serve the EMA-smoothed weights (train.ema_decay > 0 runs)",
    )
    p.add_argument(
        "--kitti_results_dir", default=None,
        help="also dump detections in official KITTI results txt format",
    )
    p.add_argument(
        "--bdd_results", default=None, metavar="JSON",
        help="also dump detections in official BDD100K submission JSON",
    )
    p.add_argument(
        "--coco_results", default=None, metavar="JSON",
        help="also dump detections in official COCO results JSON "
        "(pycocotools/eval-server format; category ids unmapped back to "
        "the annotation file's sparse ids when data.dataset=coco)",
    )
    p.add_argument(
        "--quantize", action="store_true",
        help="serve through the int8-resident backbone/FPN/head-trunks "
        "(PTQ; calibrated on the split's first images — "
        "models/calibration.py, accuracy ablation in DESIGN.md §8)",
    )
    p.add_argument(
        "--calib_images", type=int, default=8,
        help="calibration batch size for --quantize",
    )
    p.add_argument(
        "--visualize", default=None, metavar="PNG",
        help="also render the first images' detections (boxes + covariance "
        "ellipses) into a grid PNG",
    )
    p.add_argument(
        "--export_artifact", default=None, metavar="ZIP",
        help="instead of running inference, serialize the whole detect "
        "graph (weights baked in) as a StableHLO serving artifact "
        "(infer/export.py; load with ServingArtifact.load)",
    )
    p.add_argument(
        "--artifact_batch", type=int, default=1,
        help="static batch size compiled into --export_artifact",
    )
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    from bayesod_tpu.utils.config import load_config, parse_override

    overrides = dict(parse_override(o) for o in args.overrides)
    cfg = load_config(args.yaml_path, overrides)

    import jax

    from bayesod_tpu.eval.evaluator import run_inference
    from bayesod_tpu.models.retinanet import RetinaNet
    from bayesod_tpu.train import restore_state

    model = RetinaNet(cfg=cfg.model, train=False)
    if args.weights_npz and (args.checkpoint_dir or args.allow_random):
        print(
            "[infer] --weights_npz takes precedence: ignoring "
            "--checkpoint_dir/--allow_random"
        )
    try:
        state = restore_state(
            cfg, args.checkpoint_dir, model=model,
            missing_ok=args.allow_random, weights_npz=args.weights_npz,
        )
    except FileNotFoundError as e:
        raise SystemExit(f"{e} (use --allow_random for smoke runs)")
    variables = state.variables(use_ema=args.ema)

    _dataset_cache = {}

    def get_dataset():
        """Split dataset, built at most once per CLI run (a real COCO
        annotation parse is seconds — calibration, results writers, and
        visualization all reuse it)."""
        if "ds" not in _dataset_cache:
            from bayesod_tpu.data import make_dataset

            _dataset_cache["ds"] = make_dataset(cfg.data, split=args.split)
        return _dataset_cache["ds"]

    if args.quantize:
        import jax.numpy as jnp
        import numpy as np

        from bayesod_tpu.data import Loader, normalize_images
        from bayesod_tpu.models.calibration import quantized_serving_config

        calib_ds = get_dataset()
        loader = Loader(
            calib_ds, batch_size=min(args.calib_images, len(calib_ds)),
            image_hw=cfg.data.image_hw, shuffle=False, num_epochs=1,
            num_workers=1,
        )
        calib = normalize_images(
            jnp.asarray(np.asarray(next(iter(loader))["image"])),
            cfg.data.mean, cfg.data.std,
        )
        cfg = quantized_serving_config(cfg, variables, calib)
        print(
            f"quantized serving: backbone={cfg.model.backbone_dtype} "
            f"fpn={cfg.model.fpn_dtype} trunks={cfg.model.head_trunk_dtype}"
        )

    if args.export_artifact:
        from bayesod_tpu.infer.export import export_serving_artifact

        export_serving_artifact(
            cfg, variables, args.export_artifact,
            batch_size=args.artifact_batch,
        )
        print(
            f"wrote serving artifact (batch {args.artifact_batch}, "
            f"platform {jax.default_backend()}) -> {args.export_artifact}"
        )
        return

    out_path = args.out or f"data/outputs/{cfg.name}/detections_{args.split}.jsonl"
    records = run_inference(
        cfg,
        variables,
        split=args.split,
        out_path=out_path,
        max_images=args.max_images,
        batch_size=args.batch_size,
    )
    print(f"wrote {len(records)} image records -> {out_path}")

    if args.kitti_results_dir:
        from bayesod_tpu.data.kitti import write_kitti_results

        write_kitti_results(records, get_dataset(), args.kitti_results_dir)
        print(f"wrote KITTI-format results -> {args.kitti_results_dir}")

    if args.bdd_results:
        from bayesod_tpu.data.bdd import write_bdd_results

        write_bdd_results(records, args.bdd_results)
        print(f"wrote BDD-format results -> {args.bdd_results}")

    if args.coco_results:
        from bayesod_tpu.data.coco import write_coco_results

        coco_ds = get_dataset() if cfg.data.dataset == "coco" else None
        write_coco_results(records, coco_ds, args.coco_results)
        print(f"wrote COCO-format results -> {args.coco_results}")

    if args.visualize:
        from bayesod_tpu.utils.visualize import save_detection_grid

        dataset = get_dataset()
        save_detection_grid(records, dataset, args.visualize)
        print(f"wrote visualization -> {args.visualize}")


if __name__ == "__main__":
    main()
