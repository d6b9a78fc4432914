#!/bin/bash
# TPU sweep for the int8-resident serving work (run when the tunnel is up).
# ONE job at a time (CLAUDE.md: concurrent TPU procs corrupt timings).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_bayesod
LOG=/tmp/quant_sweep
mkdir -p $LOG
run() {  # run <tag> <args...>
  tag=$1; shift
  echo "=== $tag: bench.py $* ==="
  timeout 3600 python bench.py "$@" > "$LOG/$tag.json" 2> "$LOG/$tag.err"
  tail -1 "$LOG/$tag.json"
}
Q="--backbone_dtype int8_resident --trunk_dtype int8_resident --fpn_dtype int8_resident"
# Priority order per the 2026-08-19 session: defaults first (they refresh
# the ledger), then train/latency, then the quant variants (measured ~3%
# below bf16 end-to-end on the re-provisioned runtime — see DESIGN.md).
run baseline_default           # 2026-08-19 runtime: 1505.1 img/s
run bdd_default --hw 768 1280 --classes 10 --batch 48  # 785.7
run train_b32 --train --batch 32
run latency_default --latency
run quant_full $Q              # 2026-08-19: 1458.6 (opt-in; bf16 wins)
run quant_backbone --backbone_dtype int8_resident
run quant_trunk --trunk_dtype int8_resident
run quant_full_b128 $Q --batch 128
run quant_full_b192 $Q --batch 192
run bdd_quant $Q --hw 768 1280 --classes 10 --batch 48
run latency_quant $Q --latency
echo "sweep done"
# BDD-shape roofline (VERDICT item 7 parity-of-effort)
run bdd_roofline --hw 768 1280 --classes 10 --batch 48 --roofline

# Ensemble serving bench (round-2 feature; M=4 deterministic members)
run ensemble_m4 --ensemble 4 --batch 64
# Flagship-scale synthetic learning validation (chained: one TPU job at a time)
bash /root/repo/tools/flagship_synth_run.sh

# --- session-6 additions (auto-run on tunnel recovery) -----------------------
# Online-serving number through the dynamic batcher (host+tunnel-inclusive;
# small batch — the tunnel's H2D bound dominates at large batches).
# (train_b32 moved into the priority block above.)
run serve_b8 --serve --batch 8 --serve_seconds 20 --clients 16
