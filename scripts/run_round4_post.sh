#!/bin/bash
# Round-4 post-queue chip work: cash the shipped perf levers (VERDICT #3).
#  1. NS-64 quality A/B at the round-2-final recipe: mixed policy with f32
#     masters vs bf16 masters + stochastic rounding vs +EMA eval
#  2. bench.py default and --sr (BENCH_r04 candidates, incl. the new
#     samples_per_sec_batch16 headline)
# Run AFTER run_round4_queue.sh completes. Logs: /tmp/q4p_*.log
cd /root/repo

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }
run() {
  local name=$1 tmo=$2; shift 2
  note "start $name"
  timeout "$tmo" "$@" > "/tmp/q4p_${name}.log" 2>&1
  note "done $name rc=$?"
}

COMMON="--data.n_train 512 --data.train_resolution 64 --data.n_tests [64]
  --data.test_resolutions [64] --data.test_batch_sizes [16]
  --model.n_modes [32,32] --model.hidden_channels 64
  --opt.n_epochs 150 --opt.learning_rate 1e-3 --opt.step_size 40
  --device_dataset true --eval_interval 25"
MIXED="--model.weight_dtype bfloat16 --model.fno_block_precision mixed
  --opt.mixed_precision true"

run ns64_mixed 7200 python scripts/train_navier_stokes.py $COMMON $MIXED
run ns64_sr 7200 python scripts/train_navier_stokes.py $COMMON $MIXED \
  --opt.stochastic_rounding true
run ns64_ema 7200 python scripts/train_navier_stokes.py $COMMON $MIXED \
  --opt.ema_decay 0.999
run ns64_f32 7200 python scripts/train_navier_stokes.py $COMMON
run ns64_int8 7200 python scripts/train_navier_stokes.py $COMMON $MIXED \
  --opt.opt_state factored8

run provenance 7200 python scripts/eval_solver_provenance.py --n-states 64

run bench 3600 python bench.py
run bench_sr 3600 python bench.py --sr
run bench_int8 3600 python bench.py --opt-state factored8
note "post-queue complete"
touch /tmp/q4_post.done
