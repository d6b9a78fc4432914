"""Attribute the fused candidate-finals kernel's cost: fixed (gather/DMA/
launch) vs per-sample (mask hash + 9-tap matmuls + stats epilogue) work.

Round-5 found the ~45.8 ms/batch finals segment is NOT gather-dominated
(tile-skip paid 19.3 ms, block-gating paid nothing — DESIGN.md §8). This
microbench separates the remaining terms by sweeping (num_samples,
keep_prob, table dtype) on the production stats-kernel shape and fitting
  t(N) = fixed + N * per_sample:
  * N=1 vs N=10           -> per-sample slope (taps+epilogue+mask)
  * keep 1.0 vs 0.7       -> the mask-hash share of the slope
  * table int8 vs bf16    -> the gather/DMA share of the fixed term

Hoist-proofed like bench.py: each iteration's table depends on the
previous output, one D2H fetch at the end.

  python tools/candidate_finals_microbench.py [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--topk", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument(
        "--table_input", default="dma", choices=["auto", "dma", "resident", "gated"],
        help="table delivery: manual chunk DMA stream vs pipelined "
        "VMEM-resident block (round-5 A/B)",
    )
    ap.add_argument(
        "--tile", default=None,
        help="tile-major tables, e.g. 16x32 (the production layout)",
    )
    ap.add_argument("--dma_slots", type=int, default=2)
    ap.add_argument("--debug_skip", default=None, choices=["gather", "samples"])
    ap.add_argument(
        "--quick", action="store_true",
        help="only the production variant (N=10 keep=0.7, int8 + bf16)",
    )
    ap.add_argument(
        "--clustered", action="store_true",
        help="candidates clustered on a few object centers (the trained "
        "production distribution) instead of uniform spread",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bayesod_tpu.ops.candidate_reg import LevelTables, tap_major_rows
    from bayesod_tpu.ops.pallas.candidate_finals import candidate_finals_stats

    level_hw = [(48, 160), (24, 80), (12, 40), (6, 20), (3, 10)]
    tile = None
    if args.tile:
        th, tw = (int(v) for v in args.tile.lower().split("x"))
        tile = (th, tw)
    tables = LevelTables(level_hw, 9, tile_hw=tile, sort_candidates=False)
    b, c, k = args.batch, 256, args.topk
    rng = np.random.RandomState(0)
    flat = jnp.asarray(
        rng.randn(b, tables.total_rows, c) * 0.5, jnp.bfloat16
    )
    kernel = jnp.asarray(rng.randn(3, 3, c, 72) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(72) * 0.1, jnp.float32)
    a_total = sum(h * w * 9 for h, w in level_hw)
    if args.clustered:
        # ~4 object centers/image on P3; candidates = anchors in a 6x10-cell
        # neighborhood of a center (what trained preselect scores produce).
        h0, w0 = level_hw[0]
        per_img = []
        for _ in range(b):
            cand = set()
            while len(cand) < k:
                cy = rng.randint(3, h0 - 3)
                cx = rng.randint(5, w0 - 5)
                for dy in range(-3, 3):
                    for dx in range(-5, 5):
                        for a in range(9):
                            cand.add((((cy + dy) * w0) + (cx + dx)) * 9 + a)
            per_img.append(np.sort(rng.permutation(sorted(cand))[:k]))
        idx = jnp.asarray(np.stack(per_img), jnp.int32)
    else:
        idx = jnp.asarray(
            np.stack([
                np.sort(rng.choice(a_total, size=k, replace=False))
                for _ in range(b)
            ]),
            jnp.int32,
        )
    rows_pm, a_idx = tap_major_rows(idx, tables)

    def bench(n, keep, table_scale):
        f = flat
        if table_scale is not None:
            from bayesod_tpu.models.quant import quantize_act

            f = quantize_act(flat, table_scale)

        @jax.jit
        def chain(f0):
            def body(carry, _):
                fc = carry
                out = candidate_finals_stats(
                    fc, rows_pm, a_idx, kernel, bias, jnp.int32(5), n, keep,
                    9, table_scale=table_scale, chunk=tables.chunk,
                    table_input=args.table_input, dma_slots=args.dma_slots,
                    debug_skip=args.debug_skip,
                )
                bump = (jnp.sum(out) * jnp.float32(1e-30)).astype(fc.dtype)
                return fc + bump, ()

            fc, _ = jax.lax.scan(body, f0, None, length=args.iters)
            return jnp.sum(fc.astype(jnp.float32))

        # compile + warm
        np.asarray(chain(f))
        t0 = time.time()
        np.asarray(chain(f))
        dt = (time.time() - t0) / args.iters * 1000.0
        print(
            f"N={n:2d} keep={keep:.1f} table="
            f"{'int8' if table_scale else 'bf16'}: {dt:8.2f} ms/launch",
            flush=True,
        )
        return dt

    print(f"[microbench] {jax.devices()[0].device_kind}, batch {b}, "
          f"topk {k}, iters {args.iters}, table_input {args.table_input} slots {args.dma_slots} skip {args.debug_skip}",
          flush=True)
    t = {}
    variants = (
        ((10, 0.7),) if args.quick else ((1, 1.0), (10, 1.0), (10, 0.7))
    )
    for scale in (0.05, None):
        for n, keep in variants:
            t[(n, keep, scale)] = bench(n, keep, scale)
    if args.quick:
        return
    for scale in (0.05, None):
        nm = "int8" if scale else "bf16"
        slope = (t[(10, 1.0, scale)] - t[(1, 1.0, scale)]) / 9.0
        fixed = t[(1, 1.0, scale)] - slope
        mask = (t[(10, 0.7, scale)] - t[(10, 1.0, scale)]) / 10.0
        print(
            f"[{nm}] fixed(gather+DMA+launch) ~{fixed:.2f} ms, "
            f"per-sample(taps+epilogue) ~{slope:.2f} ms, "
            f"mask-hash extra ~{mask:.2f} ms/sample",
        )


if __name__ == "__main__":
    main()
