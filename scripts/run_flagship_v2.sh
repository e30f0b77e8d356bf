#!/bin/bash
# Round-5 flagship v2 (VERDICT round-4 #8: push 128_l2 below the
# data-limited 2.7e-4): warm-start from the round-4 best checkpoint
# (artifacts/ns128_f32/best_model, 128_l2 2.727e-4, trained on the FIRST
# 10k pairs) and fine-tune on the FULL 20k pairs already on disk — the
# second 10k is unseen data, doubling the effective training set for a
# fraction of a from-scratch run's chip time. Optimizer: factored-nu
# AdamW (--opt.opt_state factored; round-4 A/B: quality-neutral-or-
# better, -70% opt-state HBM), lr 3e-5 (the original run's productive
# epoch-400-500 lr was 1.9e-5; fresh-Adam steps at 3e-4 are a recorded
# NEGATIVE on this converged model — BASELINE.md pushforward row).
# Babysits across TPU-worker crashes exactly like run_flagship.sh:
# a model.msgpack in $SAVE_DIR makes every relaunch resume.
# Log: /tmp/flagship_v2.log; journal: /tmp/q5_queue.log
cd /root/repo

FLAG_LOG=/tmp/flagship_v2.log
FLAG_PID_FILE=/tmp/flagship_v2.pid
SAVE_DIR=artifacts/ns128_v2
WARM_DIR=artifacts/ns128_f32

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q5_queue.log; }

mkdir -p "$SAVE_DIR"
[ -f "$FLAG_LOG" ] && mv "$FLAG_LOG" "$FLAG_LOG.prev.$(date +%s)"

tpu_ok() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert abs(float((x@x).sum()) - 256**3) < 1e-3
print('ok')" > /tmp/q5_probe.log 2>&1
}

flagship_done() {
  grep -q '^final:' "$FLAG_LOG" 2>/dev/null
}

launch() {
  local extra="--warm_start_from $WARM_DIR"
  [ -f "$SAVE_DIR/model.msgpack" ] && extra="--resume_from_dir $SAVE_DIR"
  nohup timeout 42000 python scripts/train_navier_stokes.py \
    --data.n_train 20000 --data.train_resolution 128 \
    --data.n_tests [2000] --data.test_resolutions [128] \
    --data.test_batch_sizes [16] --data.batch_size 8 \
    --model.n_modes [64,64] --model.hidden_channels 64 \
    --model.projection_channel_ratio 4 \
    --opt.n_epochs 200 --opt.learning_rate 3e-5 --opt.weight_decay 1e-4 \
    --opt.training_loss h1 --opt.step_size 50 --opt.gamma 0.5 \
    --opt.opt_state factored \
    --opt.mixed_precision false --device_dataset true --eval_interval 25 \
    --save_dir "$SAVE_DIR" --save_every 25 --save_best 128_l2 \
    $extra >> "$FLAG_LOG" 2>&1 &
  echo $! > "$FLAG_PID_FILE"
  note "flagship-v2 launched pid $(cat $FLAG_PID_FILE) $extra"
}

launch
sleep 60

while ! flagship_done; do
  pid=$(cat "$FLAG_PID_FILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    if [ -f "$FLAG_LOG" ] && \
       [ $(( $(date +%s) - $(stat -c %Y "$FLAG_LOG") )) -gt 1800 ]; then
      note "flagship-v2 log stale >30min (pid $pid)"
      if tpu_ok; then
        note "chip healthy; killing hung pid $pid"
        kill "$pid"; sleep 10
      fi
    fi
    sleep 120
    continue
  fi
  note "flagship-v2 pid $pid gone without finishing"
  until tpu_ok; do
    note "TPU unhealthy; waiting 300s"
    sleep 300
  done
  launch
  sleep 300
done
note "flagship-v2 complete"
touch /tmp/flagship_v2.done
