#!/bin/bash
# Watch for the relayed TPU worker to come back, then resume the flagship
# f32 NS-128 run (600-epoch reference recipe) from runs/ns128_f32_ab.
# Probe = full matmul round-trip in a fresh process (device enumeration is
# not enough; after a worker restart the first process can see transient
# UNIMPLEMENTED errors, so require a real round-trip).
cd /root/repo
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert abs(float((x@x).sum()) - 256**3) < 1e-3
print('ok')
" > /tmp/tpu_probe_watch.log 2>&1; then
    echo "TPU healthy at $(date); launching flagship resume" >> /tmp/tpu_watch.log
    nohup timeout 40000 python scripts/train_navier_stokes.py \
      --data.n_train 10000 --data.train_resolution 128 \
      --data.n_tests [2000] --data.test_resolutions [128] \
      --data.test_batch_sizes [16] \
      --model.n_modes [64,64] --model.hidden_channels 64 \
      --model.projection_channel_ratio 4 \
      --opt.n_epochs 600 --opt.learning_rate 3e-4 --opt.weight_decay 1e-4 \
      --opt.training_loss h1 --opt.step_size 100 --opt.gamma 0.5 \
      --opt.mixed_precision false --device_dataset true --eval_interval 25 \
      --save_dir runs/ns128_f32_ab --save_every 25 --save_best 128_l2 \
      --resume_from_dir runs/ns128_f32_ab > /tmp/q_f32e.log 2>&1 &
    echo $! > /tmp/f32e.pid
    echo "launched pid $(cat /tmp/f32e.pid)" >> /tmp/tpu_watch.log
    exit 0
  fi
  echo "TPU still down at $(date)" >> /tmp/tpu_watch.log
  sleep 300
done
