#!/bin/bash
# Round-3 finals-lever sweep on the hoist-proofed bench: measure the int8
# candidate row tables (head_table_dtype) and the --topk 256 candidate-count
# lever on the production int8-resident graph, single-chip TPU. ONE TPU job
# at a time (CLAUDE.md) — run only when nothing else holds the chip.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_bayesod
OUT=/tmp/lever_sweep
mkdir -p $OUT

run() {
    local name=$1; shift
    echo "=== $name: bench.py $* ==="
    timeout 3000 python bench.py "$@" > $OUT/$name.log 2>&1
    rc=$?
    tail -2 $OUT/$name.log | tee $OUT/$name.json
    echo "(rc=$rc)"
}

# Baseline re-pin on today's runtime (production graph, b128 int8).
run base_b128
# The two table-quantization variants.
run tbl_int8 --table_dtype int8
run tbl_int8reg --table_dtype int8_reg
# Candidate-count lever (halves the K9xRxC gather MACs).
run topk256 --topk 256
# Combined.
run tbl_int8_topk256 --table_dtype int8 --topk 256
# Batch retune at the winner config (edit after first results if needed).
run tbl_int8_b160 --table_dtype int8 --batch 160
# BDD shape with the best tail.
run bdd_tbl_int8 --hw 768 1280 --classes 10 --batch 48 --table_dtype int8
echo "sweep done"
