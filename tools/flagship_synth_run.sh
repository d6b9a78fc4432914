#!/bin/bash
# Flagship-SCALE learning validation on TPU (configs/flagship_synthetic.yaml):
# R50 @ 384x1280 synthetic, trained end-to-end, then tools/flagship_eval.sh
# (raw/EMA eval + the paper comparison tables). Outputs live under the repo
# (data/outputs/, runs/) because /tmp is wiped between sessions (CLAUDE.md).
# ONE TPU job at a time (CLAUDE.md).
#
#   tools/flagship_synth_run.sh [TOTAL_STEPS] [TRAIN_TIMEOUT_S]
# A 2000-step run (completed LR schedule via the decay override) fits a
# ~45-min window at the measured ~1.0-1.7 s/step; config default is 3200.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_bayesod}
STEPS=${1:-2000}
TMO=${2:-2850}
RUN=data/outputs/flagship_r3
Y=configs/flagship_synthetic.yaml
mkdir -p runs

echo "=== train ($STEPS steps, timeout ${TMO}s) ==="
DECAY="[$((STEPS * 3 / 4)),$((STEPS * 9 / 10))]"
timeout "$TMO" python -m bayesod_tpu.cli.train --yaml_path $Y \
    --out_dir $RUN train.total_steps=$STEPS "train.lr_decay_steps=$DECAY" \
    > runs/flagship_r3_train.log 2>&1
echo "train rc=$? ; last metrics:"
tail -2 $RUN/metrics.jsonl

tools/flagship_eval.sh runs/flagship_eval $RUN
