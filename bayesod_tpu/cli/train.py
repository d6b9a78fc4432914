"""Training CLI — counterpart of the reference's run_training.py
(ref: src/retina_net/experiments/run_training.py; SURVEY.md §3.1).

  python -m bayesod_tpu.cli.train --yaml_path configs/retinanet_kitti.yaml \
      [--max_steps N] [--out_dir DIR] [section.key=value ...]

Same YAML+flags surface as the reference (--yaml_path), with dotted overrides
replacing one-off flags.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument(
        "--backbone_weights", default=None,
        help="pretrained ResNet archive (.npz torchvision naming or torch "
        ".pth); applied on fresh starts (models/pretrained.py)",
    )
    p.add_argument(
        "--check_data", action="store_true",
        help="dataset-layout preflight only: validate split sizes, "
        "annotation parses, class ids, box geometry and one image decode "
        "for the config's dataset, then exit (never touches the TPU — "
        "data/preflight.py)",
    )
    p.add_argument(
        "overrides", nargs="*",
        help="dotted config overrides, e.g. train.base_lr=0.001",
    )
    args = p.parse_args(argv)

    from bayesod_tpu.utils.config import load_config, parse_override

    overrides = dict(parse_override(o) for o in args.overrides)
    cfg = load_config(args.yaml_path, overrides)

    if args.check_data:
        from bayesod_tpu.data.preflight import (
            PreflightError,
            check_data,
            format_report,
        )

        try:
            reports = check_data(cfg.data)
        except PreflightError as e:
            raise SystemExit(f"check_data FAILED: {e}")
        print(format_report(reports))
        print("check_data OK")
        return

    from bayesod_tpu.train import train

    state = train(
        cfg, max_steps=args.max_steps, out_dir=args.out_dir,
        backbone_weights=args.backbone_weights,
    )
    print(f"done: step {int(state.step)}")


if __name__ == "__main__":
    main()
