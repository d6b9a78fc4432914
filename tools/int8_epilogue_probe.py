"""Does the int8-resident conv epilogue fuse, or does the int32 accumulator
round-trip HBM? (VERDICT r4 item 4, hypothesis (a) of DESIGN.md's queued
backbone levers.)

Compiles the int8-resident backbone segment for the live backend, walks the
optimized HLO's entry computation, and reports materialized result bytes BY
DTYPE plus every s32/f32 tensor above 1 MB with its producing scope. If the
dequant→BN→relu→requant chain fuses into the conv, entry-level results are
s8 and the s32 share is ~0; a large s32 share names exactly which conv
outputs spill the 4-byte accumulator (gap-sized: ~29 GB/batch of extra
traffic would explain the backbone's missing 35 ms, DESIGN.md §8).

Executes a short calibration capture (a few small batches) on the backend
first — do NOT run while a timing bench or training job owns the TPU.

  python tools/int8_epilogue_probe.py [--batch 16] [--hw 384,1280]
      [--platform cpu] [--dump_hlo PATH]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from hbm_attribution import attribute  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", default="384,1280")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--dump_hlo", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp

    from bayesod_tpu.models.calibration import quantized_serving_config
    from bayesod_tpu.models.retinanet import RetinaNet, init_variables
    from bayesod_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    hw = tuple(int(x) for x in args.hw.split(","))
    cfg = ExperimentConfig(
        name="int8_probe",
        model=ModelConfig(num_classes=3, backbone="resnet50", norm="batchnorm"),
        data=DataConfig(dataset="synthetic", image_hw=hw),
    )
    model = RetinaNet(cfg=cfg.model, train=False)
    rng = jax.random.PRNGKey(0)
    # Init + calibrate at a small spatial size (conv params/sites are
    # spatial-size independent); probe compile at the full --hw.
    small = jnp.zeros((2, 64, 128, 3), jnp.float32)
    variables = init_variables(model, rng, (64, 128), batch=2)
    qcfg = quantized_serving_config(cfg, variables, small)
    qmodel = RetinaNet(cfg=qcfg.model, train=False)
    images = jnp.zeros((args.batch, *hw, 3), jnp.bfloat16)

    def backbone(v, im):
        return qmodel.apply(v, im, method=lambda m, x: m.backbone(x))

    import time

    t0 = time.time()
    compiled = jax.jit(backbone).lower(variables, images).compile()
    print(
        f"[probe] backbone compile ({jax.devices()[0].platform}): "
        f"{time.time() - t0:.1f}s",
        file=sys.stderr,
    )
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)

    rows, _, total = attribute(hlo, 10_000)
    by_dtype = collections.Counter()
    for nbytes, _, _, _, dtype in rows:
        by_dtype[dtype] += nbytes

    print(f"\nmaterialized entry-level result bytes (batch {args.batch}):")
    for dt, b in by_dtype.most_common():
        print(f"  {dt:>5}: {b/1e9:8.3f} GB  ({100*b/max(total,1):5.1f}%)")
    print(f"  total: {total/1e9:.3f} GB\n")

    spills = [r for r in rows if r[4] in ("s32", "f32") and r[0] > 1e6]
    print(f"s32/f32 tensors > 1 MB ({len(spills)}):")
    for nbytes, name, opcode, scope, dtype in spills[: args.top]:
        print(f"{nbytes/1e6:9.1f} MB  {dtype:>4}  {opcode:<12} {scope}")
    print("\ntop tensors (all dtypes):")
    for nbytes, name, opcode, scope, dtype in rows[: args.top]:
        print(f"{nbytes/1e6:9.1f} MB  {dtype:>4}  {opcode:<12} {scope}")


if __name__ == "__main__":
    main()
