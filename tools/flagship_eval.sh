#!/bin/bash
# Turnkey post-training evaluation of the flagship synthetic checkpoint
# (VERDICT r2 items 2/6): raw + EMA eval, then the paper comparison table
# (cli/compare) at topk 512 and the accuracy-positive topk 256
# (DESIGN.md §8 topk ablation). ONE TPU job at a time (CLAUDE.md).
#
#   tools/flagship_eval.sh [OUT_DIR] [CKPT_RUN_DIR]
# defaults: OUT_DIR=runs/flagship_eval  CKPT_RUN_DIR=data/outputs/flagship_r3
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_bayesod}
OUT=${1:-runs/flagship_eval}
RUN=${2:-data/outputs/flagship_r3}
CKPT=$RUN/checkpoints
Y=configs/flagship_synthetic.yaml
mkdir -p "$OUT"

echo "=== infer val (raw weights) ==="
timeout 3600 python -m bayesod_tpu.cli.infer --yaml_path $Y --split val \
    --checkpoint_dir "$CKPT" --max_images 96 --batch_size 8 \
    --out "$OUT/det_val.jsonl" > "$OUT/infer.log" 2>&1
tail -2 "$OUT/infer.log"

echo "=== evaluate (raw) ==="
timeout 1800 python -m bayesod_tpu.cli.evaluate --yaml_path $Y \
    --detections "$OUT/det_val.jsonl" > "$OUT/eval_raw.txt" 2>&1
tail -20 "$OUT/eval_raw.txt"

echo "=== infer + evaluate (EMA weights) ==="
timeout 3600 python -m bayesod_tpu.cli.infer --yaml_path $Y --split val \
    --checkpoint_dir "$CKPT" --ema --max_images 96 --batch_size 8 \
    --out "$OUT/det_val_ema.jsonl" > "$OUT/infer_ema.log" 2>&1
timeout 1800 python -m bayesod_tpu.cli.evaluate --yaml_path $Y \
    --detections "$OUT/det_val_ema.jsonl" > "$OUT/eval_ema.txt" 2>&1
tail -20 "$OUT/eval_ema.txt"

echo "=== comparison table (all modes, topk 512) ==="
timeout 5400 python -m bayesod_tpu.cli.compare --yaml_path $Y \
    --checkpoint_dir "$CKPT" --max_images 96 --batch_size 8 \
    --out "$OUT/compare_topk512.md" --json_out "$OUT/compare_topk512.json" \
    > "$OUT/compare.log" 2>&1
cat "$OUT/compare_topk512.md" 2>/dev/null || tail -5 "$OUT/compare.log"

echo "=== comparison table (bayes_od, full int8-resident graph) ==="
timeout 3600 python -m bayesod_tpu.cli.compare --yaml_path $Y \
    --checkpoint_dir "$CKPT" --max_images 96 --batch_size 8 \
    --modes bayes_od --quantize --out "$OUT/compare_int8.md" \
    --json_out "$OUT/compare_int8.json" > "$OUT/compare_int8.log" 2>&1
cat "$OUT/compare_int8.md" 2>/dev/null || tail -5 "$OUT/compare_int8.log"

echo "=== comparison table (HEADLINE operating point: int8 + topk 256 + det preselect) ==="
# The exact configuration behind the bench headline (BENCH_r03 775 img/s):
# full int8-resident graph + int8 row tables, pre_cluster_topk=256,
# deterministic preselect — VERDICT r3 item 2's flagship-scale accuracy pin.
timeout 3600 python -m bayesod_tpu.cli.compare --yaml_path $Y \
    --checkpoint_dir "$CKPT" --max_images 96 --batch_size 8 \
    --modes bayes_od --preselect deterministic --quantize \
    --out "$OUT/compare_headline.md" \
    --json_out "$OUT/compare_headline.json" bayes.pre_cluster_topk=256 \
    > "$OUT/compare_headline.log" 2>&1
cat "$OUT/compare_headline.md" 2>/dev/null || tail -5 "$OUT/compare_headline.log"

echo "=== comparison table (bayes_od only, topk 256) ==="
timeout 3600 python -m bayesod_tpu.cli.compare --yaml_path $Y \
    --checkpoint_dir "$CKPT" --max_images 96 --batch_size 8 \
    --modes bayes_od --out "$OUT/compare_topk256.md" \
    --json_out "$OUT/compare_topk256.json" bayes.pre_cluster_topk=256 \
    > "$OUT/compare256.log" 2>&1
cat "$OUT/compare_topk256.md" 2>/dev/null || tail -5 "$OUT/compare256.log"
echo "flagship eval done -> $OUT"
