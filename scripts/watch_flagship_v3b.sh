#!/bin/bash
# Corrected flagship-v3 watcher (replaces the in-script loop of
# run_flagship_v3.sh, whose 30-min stale threshold was SHORTER than the
# normal 37-min gap between eval-epoch log lines and would kill healthy
# training — round-5 hotfix).
#
#   - stale threshold 5400s (90 min): > 2x the eval-interval log gap
#   - DRAIN_AT (epoch seconds): hard deadline after which the watcher
#     stops relaunching, kills the training PID, marks the log final,
#     and exits — guaranteeing a quiet chip for the driver's round-end
#     bench snapshot (VERDICT round-4 weakness #1b).
#
# Usage: DRAIN_AT=$(date -d '22:15' +%s) nohup bash scripts/watch_flagship_v3b.sh &
cd /root/repo

FLAG_LOG=/tmp/flagship_v3.log
FLAG_PID_FILE=/tmp/flagship_v3.pid
SAVE_DIR=artifacts/ns128_v3
WARM_DIR=artifacts/ns128_v2
EPOCHS=${EPOCHS:-120}
DRAIN_AT=${DRAIN_AT:?set DRAIN_AT to an epoch-seconds deadline}
STALE_S=5400

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q5_queue.log; }

tpu_ok() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert abs(float((x@x).sum()) - 256**3) < 1e-3
print('ok')" > /tmp/q5_probe.log 2>&1
}

flagship_done() { grep -q '^final:' "$FLAG_LOG" 2>/dev/null; }

launch() {
  local extra="--warm_start_from $WARM_DIR"
  [ -f "$SAVE_DIR/model.msgpack" ] && extra="--resume_from_dir $SAVE_DIR"
  nohup timeout 42000 python scripts/train_navier_stokes.py \
    --data.n_train 40000 --data.train_resolution 128 \
    --data.n_tests [2000] --data.test_resolutions [128] \
    --data.test_batch_sizes [16] --data.batch_size 8 \
    --model.n_modes [64,64] --model.hidden_channels 64 \
    --model.projection_channel_ratio 4 \
    --opt.n_epochs "$EPOCHS" --opt.learning_rate 3e-5 \
    --opt.weight_decay 1e-4 \
    --opt.training_loss h1 --opt.step_size 40 --opt.gamma 0.5 \
    --opt.opt_state factored \
    --opt.mixed_precision false --device_dataset true \
    --epoch_scan_chunk 2500 --eval_interval 20 \
    --save_dir "$SAVE_DIR" --save_every 20 --save_best 128_l2 \
    $extra >> "$FLAG_LOG" 2>&1 &
  echo $! > "$FLAG_PID_FILE"
  note "flagship-v3 (watcher-b) launched pid $(cat $FLAG_PID_FILE) $extra"
}

drain() {
  local pid
  pid=$(cat "$FLAG_PID_FILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    note "flagship-v3 DRAIN deadline: killing pid $pid"
    kill "$pid"; sleep 15
    kill -0 "$pid" 2>/dev/null && kill -9 "$pid"
  fi
  echo "final: drained at deadline $(date '+%H:%M:%S')" >> "$FLAG_LOG"
  touch /tmp/flagship_v3.done
  note "flagship-v3 drained; chip free"
}

note "watcher-b started (stale=${STALE_S}s, drain at $(date -d @$DRAIN_AT '+%H:%M:%S'))"

while ! flagship_done; do
  if [ "$(date +%s)" -ge "$DRAIN_AT" ]; then drain; exit 0; fi
  pid=$(cat "$FLAG_PID_FILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    if [ -f "$FLAG_LOG" ] && \
       [ $(( $(date +%s) - $(stat -c %Y "$FLAG_LOG") )) -gt "$STALE_S" ]; then
      note "flagship-v3 log stale >${STALE_S}s (pid $pid)"
      if tpu_ok; then
        note "chip healthy; killing hung pid $pid"
        kill "$pid"; sleep 10
      fi
    fi
    sleep 120
    continue
  fi
  note "flagship-v3 pid $pid gone without finishing"
  until tpu_ok; do
    note "TPU unhealthy; waiting 300s"
    sleep 300
  done
  launch
  sleep 300
done
note "flagship-v3 complete (watcher-b)"
touch /tmp/flagship_v3.done
