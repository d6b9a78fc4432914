"""Per-op HBM byte attribution for the train step (VERDICT r3 item 7).

The round-3 ledger closed the train step at 68% of its HBM floor and
declared the remaining ~78 ms/step "irreducible saved-activation traffic"
from knob outcomes alone (remat=full/blocks both measured as losses,
DESIGN.md §8). This tool replaces that assertion with byte attribution:
compile the REAL train step, walk the optimized HLO, and rank every
materialized tensor (= HBM write + at least one read in a fused module)
by size, labeled with the JAX scope that produced it.

  python tools/hbm_attribution.py [--batch 32] [--platform tpu|cpu]
      [--top 30] [--mode train|detect] [--dump_hlo PATH]

On the axon tunnel this is COMPILE-ONLY (no step executes) but still
holds the remote compiler for ~1-2 min — don't run it while a timing
bench is in flight.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

# f32[32,96,320,64]{3,2,1,0:T(8,128)}  (layout suffix optional)
_SHAPE_RE = re.compile(r"\b(pred|[sufbc]\d+|bf16)\[([\d,]*)\]")
_META_RE = re.compile(r'op_name="([^"]*)"')
# "  %name = <result> <opcode>(...)" — result may be a tuple.
_INSTR_RE = re.compile(r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*)$")


def _shape_bytes(text: str) -> int:
    """Total bytes of every array literal in an HLO result type string."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def _short_scope(op_name: str) -> str:
    """Compress a JAX op_name scope to its informative tail, tagged
    fwd/bwd (transpose(...) in the scope = backward of that primitive)."""
    tag = "bwd" if "transpose(" in op_name else "fwd"
    clean = re.sub(r"(jit|jvp|vmap|transpose|remat)\(", "", op_name).replace(")", "")
    parts = [p for p in clean.split("/") if p]
    # Drop the trailing primitive name when there's layer context above it,
    # so aggregation groups by layer, not by "add"/"mul".
    if len(parts) > 2:
        parts = parts[:-1]
    return tag + ":" + "/".join(parts[-4:]) if parts else op_name


def attribute(hlo_text: str, top: int):
    """Rank entry-computation instructions by result bytes.

    Post-fusion optimized HLO materializes every entry/fusion-level result
    in HBM (fused intermediates live inside the fusion bodies and never
    appear at this level), so result bytes here ≈ HBM writes. Parameters
    and constants are skipped — they're weights/inputs, not activations.
    """
    rows = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, rest = m.groups()
        opcode_m = re.search(r"\)\s*\}?\s*(\w[\w\-]*)\(", rest) or re.search(
            r"\}\s*(\w[\w\-]*)\(", rest
        )
        # result type ends where the opcode starts; find opcode word:
        om = re.search(r"(?:\{[^}]*\})?\s([a-z][\w\-]*)\(", rest)
        opcode = om.group(1) if om else "?"
        if opcode in ("parameter", "constant", "iota", "get-tuple-element",
                      "tuple", "bitcast"):
            continue
        # Bytes of the result only (the part before the opcode).
        cut = om.start(1) if om else len(rest)
        nbytes = _shape_bytes(rest[:cut])
        if nbytes == 0:
            continue
        meta = _META_RE.search(rest)
        scope = _short_scope(meta.group(1)) if meta else name
        arrays = _SHAPE_RE.findall(rest[:cut])

        def _abytes(a):
            n = 1
            for d in a[1].split(","):
                if d:
                    n *= int(d)
            return n * _DTYPE_BYTES.get(a[0], 4)

        dtype = max(arrays, key=_abytes)[0] if arrays else "?"
        rows.append((nbytes, name, opcode, scope, dtype))
    rows.sort(key=lambda r: r[0], reverse=True)
    total = sum(r[0] for r in rows)
    by_scope = collections.Counter()
    for nbytes, _, _, scope, _ in rows:
        by_scope[scope] += nbytes
    return rows[:top], by_scope.most_common(top), total


def build_train(cfg, batch_size):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bayesod_tpu.data import Loader
    from bayesod_tpu.data.synthetic import SyntheticDataset
    from bayesod_tpu.ops import anchors as anchor_ops
    from bayesod_tpu.train import (
        build_train_step,
        create_train_state,
        make_train_model,
    )

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=batch_size)
    )
    model = make_train_model(cfg)
    anchors = anchor_ops.generate_anchors(cfg.data.image_hw, cfg.anchors)
    state = create_train_state(
        model, cfg.train, jax.random.PRNGKey(0), cfg.data.image_hw
    )
    ds = SyntheticDataset(size=batch_size, image_hw=cfg.data.image_hw)
    batch = next(iter(Loader(
        ds, batch_size=batch_size, image_hw=cfg.data.image_hw,
        max_gt_boxes=cfg.data.max_gt_boxes, num_epochs=1, num_workers=1,
    )))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    step_fn = build_train_step(cfg, anchors, model)
    return jax.jit(step_fn), (state, batch)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--hw", default="384,1280")
    ap.add_argument("--dump_hlo", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from bayesod_tpu.utils.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
    )

    hw = tuple(int(x) for x in args.hw.split(","))
    cfg = ExperimentConfig(
        name="hbm_attr",
        model=ModelConfig(num_classes=3, backbone="resnet50", norm="batchnorm"),
        data=DataConfig(dataset="synthetic", image_hw=hw),
    )

    fn, fargs = build_train(cfg, args.batch)
    import time
    t0 = time.time()
    compiled = fn.lower(*fargs).compile()
    print(f"[attr] compile ({jax.devices()[0].platform}): "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
        print(f"[attr] HLO -> {args.dump_hlo} ({len(hlo)/1e6:.1f} MB)",
              file=sys.stderr)
    rows, by_scope, total = attribute(hlo, args.top)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    acc = float(ca.get("bytes accessed", 0.0))
    print(f"\ntotal materialized result bytes (entry level): "
          f"{total/1e9:.3f} GB | cost-analysis 'bytes accessed': "
          f"{acc/1e9:.3f} GB | batch {args.batch} "
          f"-> {total/args.batch/1e9:.4f} GB/img written\n")
    print(f"{'MB':>9}  {'dtype':>5}  {'op':<14} scope")
    for nbytes, name, opcode, scope, dtype in rows:
        print(f"{nbytes/1e6:9.1f}  {dtype:>5}  {opcode:<14} {scope}")
    print("\n-- aggregated by scope --")
    for scope, nbytes in by_scope:
        print(f"{nbytes/1e6:9.1f}  {scope}")


if __name__ == "__main__":
    main()
