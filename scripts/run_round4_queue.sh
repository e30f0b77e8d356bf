#!/bin/bash
# Round-4 chip orchestration:
#  1. babysit the flagship 600-epoch f32 NS-128 run (relaunch with
#     --resume_from_dir if the process dies before epoch 599; the relayed
#     TPU worker crashed twice during round-3's flagship)
#  2. when it completes: super-res + rollout evals on the final model,
#     the solver-provenance bound, then the converged family-quality
#     queue (SFNO-SWE, UNO/LocalNO/CODANO Darcy, FNO-3D MHD)
# Logs: /tmp/q4_*.log; queue journal: /tmp/q4_queue.log
cd /root/repo

FLAG_LOG=/tmp/flagship.log
FLAG_PID_FILE=/tmp/flagship.pid
SAVE_DIR=artifacts/ns128_f32

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }

tpu_ok() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert abs(float((x@x).sum()) - 256**3) < 1e-3
print('ok')" > /tmp/q4_probe.log 2>&1
}

flagship_done() {
  grep -q '^final:' "$FLAG_LOG" 2>/dev/null || grep -q '^\[599\]' "$FLAG_LOG" 2>/dev/null
}

# ---- phase 1: babysit the flagship ----
while ! flagship_done; do
  pid=$(cat "$FLAG_PID_FILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    sleep 120
    continue
  fi
  note "flagship pid $pid gone without finishing"
  # wait for a healthy worker, then resume from periodic saves
  until tpu_ok; do
    note "TPU unhealthy; waiting 300s"
    sleep 300
  done
  note "relaunching flagship with --resume_from_dir $SAVE_DIR"
  nohup timeout 42000 python scripts/train_navier_stokes.py \
    --data.n_train 10000 --data.train_resolution 128 \
    --data.n_tests [2000] --data.test_resolutions [128] \
    --data.test_batch_sizes [16] --data.batch_size 8 \
    --model.n_modes [64,64] --model.hidden_channels 64 \
    --model.projection_channel_ratio 4 \
    --opt.n_epochs 600 --opt.learning_rate 3e-4 --opt.weight_decay 1e-4 \
    --opt.training_loss h1 --opt.step_size 100 --opt.gamma 0.5 \
    --opt.mixed_precision false --device_dataset true --eval_interval 25 \
    --save_dir "$SAVE_DIR" --save_every 25 --save_best 128_l2 \
    --resume_from_dir "$SAVE_DIR" >> "$FLAG_LOG" 2>&1 &
  echo $! > "$FLAG_PID_FILE"
  sleep 300
done
note "flagship complete"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  note "start $name"
  timeout "$tmo" "$@" > "/tmp/q4_${name}.log" 2>&1
  note "done $name rc=$?"
}

# ---- phase 2: final-model evals + provenance ----
run gen256 7200 python scripts/generate_ns_data.py \
  --res 256 --train-traj 0 --test-traj 8 --batch 8
run gen512 14400 python scripts/generate_ns_data.py \
  --res 512 --train-traj 0 --test-traj 4 --batch 4
run superres 10800 python scripts/eval_ns_superres.py \
  --save_dir "$SAVE_DIR" --eval_res [128,256,512]
run rollout 7200 python scripts/eval_ns_rollout.py --save_dir "$SAVE_DIR"
run provenance 3600 python scripts/eval_solver_provenance.py --n-states 64

# ---- phase 3: converged family-quality queue ----
run sfno 14400 python scripts/train_sfno_swe.py --n_epochs 100 --verbose true
run uno 14400 python scripts/train_family_quality.py --family uno --n_epochs 300
run local_no 14400 python scripts/train_family_quality.py --family local_no --n_epochs 300
run codano 14400 python scripts/train_family_quality.py --family codano --n_epochs 300
run mhd 14400 python scripts/train_mhd64.py \
  --data.resolution 64 --data.n_train 64 --data.n_test 16 \
  --data.batch_size 4 --opt.n_epochs 60 --opt.learning_rate 1e-3 \
  --opt.step_size 20 --eval_interval 10
note "queue complete"
