#!/bin/bash
# Round-4: mid-scale factored-nu quality probe at the flagship recipe
# shape (FNO_Medium2d 69M params, H1 loss, NS-128, n_train 2000,
# 100 epochs — the round-3 scaling-curve row's recipe). Two arms run
# serially (full AdamW vs factored-nu AdamW, both mixed precision) so
# the comparison is like-for-like on this round's code; derisks
# switching the flagship to factored-nu in round 5 (the NS-64 A/B showed
# -16..-27% error, BASELINE.md round-4). Waits for mhd2 to finish so at
# most two jobs share the chip (the 600-epoch flagship runs throughout —
# wall times carry contention and are not perf claims).
# Logs: /tmp/q4_probe_{full,factored}.log; journal /tmp/q4_queue.log
cd /root/repo

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }

until [ -f /tmp/mhd2.done ]; do sleep 60; done

run_arm() {
  local name=$1 opt_state=$2
  note "factored-probe arm $name launching"
  timeout 7200 python scripts/train_navier_stokes.py \
    --data.n_train 2000 --data.train_resolution 128 \
    --data.n_tests [2000] --data.test_resolutions [128] \
    --data.test_batch_sizes [16] --data.batch_size 8 \
    --model.n_modes [64,64] --model.hidden_channels 64 \
    --model.projection_channel_ratio 4 \
    --opt.n_epochs 100 --opt.learning_rate 3e-4 --opt.weight_decay 1e-4 \
    --opt.training_loss h1 --opt.step_size 100 --opt.gamma 0.5 \
    --opt.mixed_precision true --opt.opt_state "$opt_state" \
    --device_dataset true --eval_interval 25 \
    > "/tmp/q4_probe_${name}.log" 2>&1
  note "factored-probe arm $name done rc=$?"
}

run_arm full full
run_arm factored factored
touch /tmp/factored_probe.done
note "factored probe complete"
