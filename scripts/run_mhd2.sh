#!/bin/bash
# Round-4: the properly-specified MHD-64 synthetic run (BASELINE.md's
# pending "mhd2" row: modes 16^3 covering the band limit, hidden 32,
# 128 samples, 100 epochs). Waits for the NS-128 datagen to release the
# chip, then runs concurrently with the flagship (contention noted in
# BASELINE.md). Log: /tmp/q4_mhd2.log; journal: /tmp/q4_queue.log
cd /root/repo

DATA=neuraloperator_tpu/data/datasets/data
note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }

until [ -f "$DATA/nsforcing_train_128.pt" ] && [ -f "$DATA/nsforcing_test_128.pt" ]; do
  sleep 60
done
note "mhd2 launching (NS datagen done)"
timeout 10800 python scripts/train_mhd64.py \
  --data.resolution 64 --data.n_train 128 --data.n_test 32 \
  --data.batch_size 4 --model.n_modes [16,16,16] \
  --model.hidden_channels 32 --opt.n_epochs 100 \
  --opt.learning_rate 3e-3 --opt.step_size 30 --eval_interval 20 \
  > /tmp/q4_mhd2.log 2>&1
note "mhd2 done rc=$?"
touch /tmp/mhd2.done
