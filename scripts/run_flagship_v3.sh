#!/bin/bash
# Round-5 flagship v3 (VERDICT round-4 #8: push 128_l2 below 2e-4):
# extend the training set to 40k pairs (+400 trajectories at seed 5000,
# merged+reshuffled by scripts/merge_ns_train_data.py) and warm-start
# from the v2 best (artifacts/ns128_v2/best_model, 128_l2 2.32e-4,
# trained on the first 20k). The round-3 scaling curve (l2 ~ n^-0.36)
# predicts ~2.32e-4 * 2^-0.36 ~ 1.8e-4 at 40k. Same recipe family as v2:
# factored-nu AdamW, lr 3e-5, f32, device-dataset epoch-scan.
# Babysits across TPU-worker crashes exactly like run_flagship_v2.sh.
# Log: /tmp/flagship_v3.log; journal: /tmp/q5_queue.log
cd /root/repo

FLAG_LOG=/tmp/flagship_v3.log
FLAG_PID_FILE=/tmp/flagship_v3.pid
SAVE_DIR=artifacts/ns128_v3
WARM_DIR=artifacts/ns128_v2
EPOCHS=${EPOCHS:-120}
GEN_TRAJ=${GEN_TRAJ:-400}
EXT_DIR=neuraloperator_tpu/data/datasets/data/ns_ext

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

# ---- phase 1: data extension (idempotent: skipped once merged) --------
N_PAIRS=$(python - << 'EOF'
import torch
d = torch.load(
    "neuraloperator_tpu/data/datasets/data/nsforcing_train_128.pt",
    weights_only=True, mmap=True)
print(len(d["x"]))
EOF
)
note "flagship-v3: train file has $N_PAIRS pairs"
if [ "$N_PAIRS" -lt 40000 ]; then
  if [ ! -f "$EXT_DIR/nsforcing_train_128.pt" ]; then
    note "flagship-v3: generating +$GEN_TRAJ trajectories (seed 5000)"
    until tpu_ok; do note "TPU unhealthy; waiting 300s"; sleep 300; done
    timeout 21600 python scripts/generate_ns_data.py --res 128 \
      --train-traj "$GEN_TRAJ" --test-traj 0 --seed 5000 \
      --out "$EXT_DIR" >> /tmp/flagship_v3_gen.log 2>&1 || {
        note "flagship-v3: generation FAILED (see /tmp/flagship_v3_gen.log)"
        exit 1
      }
  fi
  python scripts/merge_ns_train_data.py --ext-dir "$EXT_DIR" \
    >> /tmp/flagship_v3_gen.log 2>&1 || exit 1
  note "flagship-v3: merge complete"
fi

# ---- phase 2: babysat warm-start fine-tune ----------------------------
flagship_done() {
  grep -q '^final:' "$FLAG_LOG" 2>/dev/null
}

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
  note "flagship-v3 launched pid $(cat $FLAG_PID_FILE) $extra"
}

launch
sleep 60

while ! flagship_done; do
  pid=$(cat "$FLAG_PID_FILE" 2>/dev/null)
  if [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null; then
    if [ -f "$FLAG_LOG" ] && \
       [ $(( $(date +%s) - $(stat -c %Y "$FLAG_LOG") )) -gt 1800 ]; then
      note "flagship-v3 log stale >30min (pid $pid)"
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
note "flagship-v3 complete"
touch /tmp/flagship_v3.done
