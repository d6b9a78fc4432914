#!/bin/bash
# Flagship-SCALE learning validation on TPU (configs/flagship_synthetic.yaml):
# R50 @ 384x1280 synthetic, 400 steps, then dump + evaluate (raw and EMA
# weights). ONE TPU job at a time (CLAUDE.md).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_bayesod
OUT=/tmp/flagship_synth
mkdir -p $OUT
Y=configs/flagship_synthetic.yaml

echo "=== train (400 steps) ==="
timeout 7200 python -m bayesod_tpu.cli.train --yaml_path $Y \
    > $OUT/train.log 2>&1
tail -3 $OUT/train.log

echo "=== infer val (raw weights) ==="
timeout 3600 python -m bayesod_tpu.cli.infer --yaml_path $Y --split val \
    --max_images 64 --batch_size 8 --out $OUT/det_val.jsonl \
    > $OUT/infer.log 2>&1
tail -2 $OUT/infer.log

echo "=== evaluate (raw) ==="
timeout 1800 python -m bayesod_tpu.cli.evaluate --yaml_path $Y \
    --detections $OUT/det_val.jsonl > $OUT/eval_raw.txt 2>&1
tail -20 $OUT/eval_raw.txt

echo "=== infer val (EMA weights) ==="
timeout 3600 python -m bayesod_tpu.cli.infer --yaml_path $Y --split val \
    --ema --max_images 64 --batch_size 8 --out $OUT/det_val_ema.jsonl \
    > $OUT/infer_ema.log 2>&1

echo "=== evaluate (EMA) ==="
timeout 1800 python -m bayesod_tpu.cli.evaluate --yaml_path $Y \
    --detections $OUT/det_val_ema.jsonl > $OUT/eval_ema.txt 2>&1
tail -20 $OUT/eval_ema.txt
echo "flagship synth run done"
