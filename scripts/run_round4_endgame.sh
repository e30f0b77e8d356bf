#!/bin/bash
# Round-4 endgame: prewarm every remaining TPU program NOW (while the
# 600-epoch flagship still trains, absorbing the compile contention
# early), then run the warm final evals the moment the flagship
# completes — replacing run_flagship_evals.sh, whose cold gen512 +
# 512^2-superres compile would have landed after round end and
# contended with the driver's bench run.
#
# Phase A (immediate, serial): 512^2 test-set datagen already launched
# separately (gen512); prewarm the 512 superres program, the K=4
# pushforward-training program, and the roofline profile program on the
# CURRENT best checkpoint (results discarded — only the persistent
# compile cache matters).
# Phase B (gated on /tmp/flagship.done): superres [128,256,512],
# rollout eval, then pushforward fine-tune (2 epochs, 64 trajectories)
# + re-eval — all compiles warm from phase A.
# Logs: /tmp/q4_<name>.log; journal /tmp/q4_queue.log
cd /root/repo

SAVE_DIR=artifacts/ns128_f32
note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }
run() {
  local name=$1 tmo=$2; shift 2
  note "start $name"
  timeout "$tmo" "$@" > "/tmp/q4_${name}.log" 2>&1
  note "done $name rc=$?"
}

DATA=neuraloperator_tpu/data/datasets/data

# ---- phase A: prewarms ----
until [ -f "$DATA/nsforcing_test_512.pt" ] && ! kill -0 "$(cat /tmp/gen512.pid 2>/dev/null)" 2>/dev/null; do
  [ -f /tmp/flagship.done ] && break   # flagship done early: skip straight on
  sleep 60
done
note "gen512 ready"

if [ ! -f /tmp/flagship.done ]; then
  run superres512_pre 7200 python scripts/eval_ns_superres.py \
    --save_dir "$SAVE_DIR" --eval_res [512]
  run pushforward_pre 7200 python scripts/eval_ns_rollout.py \
    --save_dir "$SAVE_DIR" --n_traj 8 --train_traj 8 \
    --pushforward_epochs 1
  run roofline_pre 7200 python scripts/roofline_ns_step.py
fi
note "prewarms complete"

# ---- phase B: final evals on the completed flagship ----
until [ -f /tmp/flagship.done ]; do sleep 120; done
note "flagship final evals starting"

run superres_final 3600 python scripts/eval_ns_superres.py \
  --save_dir "$SAVE_DIR" --eval_res [128,256,512]
run rollout_final 3600 python scripts/eval_ns_rollout.py \
  --save_dir "$SAVE_DIR"
run pushforward_final 7200 python scripts/eval_ns_rollout.py \
  --save_dir "$SAVE_DIR" --pushforward_epochs 2
note "flagship final evals complete"
touch /tmp/q4_endgame.done
