#!/bin/bash
# Wait for the relayed TPU worker to come back, then run the remaining
# converged quality jobs sequentially (each is small next to the flagship
# resume, which scripts/watch_tpu_resume.sh launches independently):
#   1. SFNO spherical-SWE, reference recipe + 2x zero-shot eval
#   2. UNO / LocalNO / CODANO converged Darcy (train_family_quality.py)
#   3. FNO-3D on synthetic MHD (res 32, converged)
# Logs land in /tmp/q_<name>.log; JSON/final lines are what BASELINE.md
# records.
cd /root/repo
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert abs(float((x@x).sum()) - 256**3) < 1e-3
print('ok')
" > /tmp/tpu_probe_queue.log 2>&1; then
    echo "TPU healthy at $(date); starting quality queue" >> /tmp/q_queue.log
    break
  fi
  echo "TPU still down at $(date)" >> /tmp/q_queue.log
  sleep 300
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[$(date)] start $name" >> /tmp/q_queue.log
  timeout "$tmo" "$@" > "/tmp/q_${name}.log" 2>&1
  echo "[$(date)] done $name rc=$?" >> /tmp/q_queue.log
}

run sfno 14400 python scripts/train_sfno_swe.py --n_epochs 100 --verbose true
run uno 14400 python scripts/train_family_quality.py --family uno --n_epochs 300
run local_no 14400 python scripts/train_family_quality.py --family local_no --n_epochs 300
run codano 14400 python scripts/train_family_quality.py --family codano --n_epochs 300
run mhd 14400 python scripts/train_mhd64.py \
  --data.resolution 32 --data.n_train 64 --data.n_test 16 \
  --data.batch_size 4 --opt.n_epochs 60 --opt.learning_rate 1e-3 \
  --opt.step_size 20 --eval_interval 10
echo "[$(date)] queue complete" >> /tmp/q_queue.log
