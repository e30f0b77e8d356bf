#!/bin/bash
# Round-4 phase 3: when the 600-epoch flagship completes
# (/tmp/flagship.done from run_flagship.sh), refresh the super-res,
# rollout, and provenance tables on the FINAL model (VERDICT #2's
# "re-eval super-res (2x/4x) and rollout on the final model").
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

until [ -f /tmp/flagship.done ]; do sleep 120; done
note "flagship evals starting"

run gen256 7200 python scripts/generate_ns_data.py \
  --res 256 --train-traj 0 --test-traj 8 --batch 8
run gen512 14400 python scripts/generate_ns_data.py \
  --res 512 --train-traj 0 --test-traj 4 --batch 4
run superres 10800 python scripts/eval_ns_superres.py \
  --save_dir "$SAVE_DIR" --eval_res [128,256,512]
run rollout 7200 python scripts/eval_ns_rollout.py --save_dir "$SAVE_DIR"
note "flagship evals complete"
touch /tmp/q4_evals.done
