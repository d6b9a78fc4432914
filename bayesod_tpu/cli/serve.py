"""Serving CLI — the online counterpart of cli/infer's offline dump loop.

  python -m bayesod_tpu.cli.serve --yaml_path configs/retinanet_kitti.yaml \
      [--checkpoint_dir DIR] [--port 8000] [--batch_size 8] \
      [--max_delay_ms 5] [--ema] [--quantize] [section.key=value ...]

Starts the dynamic-batching DetectionServer (infer/server.py) behind a
minimal HTTP JSON endpoint:

  curl -X POST --data-binary @image.png http://host:8000/detect
  curl http://host:8000/stats     # batching fill / request counters
  curl http://host:8000/healthz

The reference has no serving stack (SURVEY.md §2) — this is the
production-serving surface the TPU rebuild adds on top of the same
checkpoint + YAML artifacts the offline tools use.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument(
        "--batch_size", type=int, default=8,
        help="compiled device batch size (requests are coalesced up to it)",
    )
    p.add_argument(
        "--max_delay_ms", type=float, default=5.0,
        help="max time the first request in a batch waits for co-riders",
    )
    p.add_argument(
        "--allow_random", action="store_true",
        help="serve random-init weights when no checkpoint exists (smoke)",
    )
    p.add_argument(
        "--ema", action="store_true",
        help="serve the EMA-smoothed weights (train.ema_decay > 0 runs)",
    )
    p.add_argument(
        "--quantize", action="store_true",
        help="serve the int8-resident graph (PTQ; calibrates on synthetic "
        "frames unless --calib_dir holds images)",
    )
    p.add_argument(
        "--calib_dir", default=None,
        help="directory of images for --quantize calibration",
    )
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import numpy as np

    from bayesod_tpu.infer.api import Detector
    from bayesod_tpu.infer.server import DetectionServer, serve_http
    from bayesod_tpu.utils.config import load_config, parse_override

    overrides = dict(parse_override(o) for o in args.overrides)
    cfg = load_config(args.yaml_path, overrides)

    from bayesod_tpu.train import restore_state

    # Same restore semantics as cli/infer: --allow_random covers ONLY the
    # no-checkpoint case (restore_state missing_ok); a corrupt checkpoint
    # or model-build error still fails loudly instead of silently serving
    # random weights.
    try:
        state = restore_state(
            cfg, args.checkpoint_dir, missing_ok=args.allow_random
        )
    except FileNotFoundError as e:
        raise SystemExit(f"{e} (use --allow_random for smoke runs)")
    if int(state.step) == 0:
        print("serving RANDOM-INIT weights (no checkpoint restored)")
    det = Detector(
        cfg, state.variables(use_ema=args.ema), batch_size=args.batch_size
    )

    if args.quantize:
        if args.calib_dir:
            import glob
            import os

            from bayesod_tpu.data.loader import load_image_rgb

            paths = sorted(glob.glob(os.path.join(args.calib_dir, "*")))[:8]
            calib = [load_image_rgb(p) for p in paths]
        else:
            rng = np.random.default_rng(0)
            calib = [
                rng.integers(0, 255, (*cfg.data.image_hw, 3), np.uint8)
                for _ in range(8)
            ]
        det = det.quantized(calib)
        print("serving the int8-resident graph")

    # Warm the compile before accepting traffic (first TPU compile of the
    # flagship graph is minutes; do it here, not on request #1).
    det([np.zeros((64, 64, 3), np.uint8)])
    print(f"compiled batch={args.batch_size}; serving on "
          f"{args.host}:{args.port}")
    with DetectionServer(det, max_delay_ms=args.max_delay_ms) as srv:
        serve_http(srv, args.host, args.port)


if __name__ == "__main__":
    main()
