"""Export a trained Orbax checkpoint as a serving-weights npz archive.

A full TrainState checkpoint is ~3.4x the model (params + adamw moments +
EMA); eval/serving needs params/batch_stats/EMA only, and only git-committed
files persist between sessions in this environment (CLAUDE.md). One
compressed npz (train/checkpoint.py save_weights_npz) is the committable
form; load it back with `--weights_npz` on cli/infer + cli/compare.

  python tools/export_weights.py --yaml_path configs/flagship_synthetic.yaml \
      --checkpoint_dir data/outputs/flagship_r3/checkpoints \
      --out data/outputs/flagship_r3/weights.npz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--yaml_path", required=True)
    p.add_argument("--checkpoint_dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--dtype", default="float16",
        help="archive float dtype (float16 halves the committed size; "
        "serving runs bf16, so fp16 storage is lossless for it. "
        "Pass float32 for exact-resume archives.)",
    )
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # restore/export is host work

    from bayesod_tpu.train import restore_state, save_weights_npz
    from bayesod_tpu.utils.config import load_config, parse_override

    cfg = load_config(
        args.yaml_path, dict(parse_override(o) for o in args.overrides)
    )
    state = restore_state(cfg, args.checkpoint_dir)
    n = save_weights_npz(state, args.out, dtype=args.dtype)
    mb = os.path.getsize(args.out) / 1e6
    print(
        f"wrote {args.out}: {n} arrays, {mb:.1f} MB, step {int(state.step)}"
    )


if __name__ == "__main__":
    main()
