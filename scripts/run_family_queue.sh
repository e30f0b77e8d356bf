#!/bin/bash
# Round-4 family-quality queue (VERDICT next-round #1): converged runs for
# the families that only ever had smokes. Runs serially; logs /tmp/q4_*.log.
cd /root/repo

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }
run() {
  local name=$1 tmo=$2; shift 2
  note "start $name"
  timeout "$tmo" "$@" > "/tmp/q4_${name}.log" 2>&1
  note "done $name rc=$?"
}

run sfno 14400 python scripts/train_sfno_swe.py --n_epochs 100 --verbose true
run uno 14400 python scripts/train_family_quality.py --family uno --n_epochs 300
run local_no 14400 python scripts/train_family_quality.py --family local_no --n_epochs 300
run codano 14400 python scripts/train_family_quality.py --family codano --n_epochs 300
run mhd 14400 python scripts/train_mhd64.py \
  --data.resolution 64 --data.n_train 64 --data.n_test 16 \
  --data.batch_size 4 --opt.n_epochs 60 --opt.learning_rate 1e-3 \
  --opt.step_size 20 --eval_interval 10
note "family queue complete"
