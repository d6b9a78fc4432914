#!/bin/bash
# Flagship-SCALE learning validation on TPU (configs/flagship_synthetic.yaml):
# R50 @ 384x1280 synthetic, trained end-to-end, then tools/flagship_eval.sh
# (raw/EMA eval + the paper comparison tables). Outputs live under the repo
# (data/outputs/, runs/) because /tmp is wiped between sessions (CLAUDE.md).
# ONE TPU job at a time (CLAUDE.md).
#
#   tools/flagship_synth_run.sh [TOTAL_STEPS] [TRAIN_TIMEOUT_S]
#
# RESUMABLE-TO-COMPLETION (VERDICT r3 item 6): the trainer restores the
# newest checkpoint on start, so this driver loops restore-and-continue
# until metrics.jsonl reaches TOTAL_STEPS (or the loop stops progressing),
# then exports committable npz weights (tools/export_weights.py — only
# git-committed files persist between sessions) and runs the eval stage.
# A session timeout mid-train costs nothing: rerun the same command.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache_bayesod}
STEPS=${1:-2400}
TMO=${2:-4000}
RUN=${RUN:-data/outputs/flagship_r4}
Y=configs/flagship_synthetic.yaml
mkdir -p runs

last_step() {  # newest step recorded in metrics.jsonl (0 if none)
    [ -f "$RUN/metrics.jsonl" ] || { echo 0; return; }
    tail -1 "$RUN/metrics.jsonl" | sed -n 's/.*"step": \([0-9]*\).*/\1/p'
}

DECAY="[$((STEPS * 3 / 4)),$((STEPS * 9 / 10))]"
attempt=0
while true; do
    cur=$(last_step)
    if [ "${cur:-0}" -ge "$STEPS" ]; then
        echo "=== training complete at step $cur (target $STEPS) ==="
        break
    fi
    attempt=$((attempt + 1))
    if [ "$attempt" -gt 6 ]; then
        echo "!!! giving up after $attempt attempts (stuck at step $cur)"
        break
    fi
    echo "=== train attempt $attempt: step $cur -> $STEPS (timeout ${TMO}s) ==="
    timeout "$TMO" python -m bayesod_tpu.cli.train --yaml_path $Y \
        --out_dir $RUN train.total_steps=$STEPS \
        "train.lr_decay_steps=$DECAY" \
        >> runs/flagship_r4_train.log 2>&1
    rc=$?
    new=$(last_step)
    [ "$rc" -eq 124 ] && echo "(attempt timed out at step $new; resuming)"
    if [ "${new:-0}" -le "${cur:-0}" ] && [ "$rc" -ne 0 ]; then
        echo "!!! no progress (rc=$rc, step $cur -> $new); see train log:"
        tail -5 runs/flagship_r4_train.log
        break
    fi
done
tail -2 "$RUN/metrics.jsonl" 2>/dev/null

echo "=== export committable serving weights (npz) ==="
python tools/export_weights.py --yaml_path $Y \
    --checkpoint_dir "$RUN/checkpoints" --out "$RUN/weights.npz" \
    || echo "!!! weights export failed"

tools/flagship_eval.sh ${EVAL_OUT:-runs/flagship_eval_r4} $RUN
