#!/bin/bash
# Round-4: CODANO capacity probe on Darcy. The recorded converged row
# (l2 0.4727 @300ep, 220k params) underfits badly at TRAIN time
# (train H1 1.056): probe whether capacity (hidden_variable_codimension,
# attention_token_dim) or lr is the limiter, 100 epochs per arm, serial
# so at most one extra job shares the chip with the flagship.
# Logs: /tmp/q4_codano_<arm>.log; journal /tmp/q4_queue.log
cd /root/repo

note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q4_queue.log; }

run_arm() {
  local name=$1; shift
  note "codano-probe arm $name launching"
  timeout 7200 python scripts/train_family_quality.py --family codano \
    --n_epochs 100 "$@" > "/tmp/q4_codano_${name}.log" 2>&1
  note "codano-probe arm $name done rc=$?"
}

run_arm hvc64 --hidden_variable_codimension 64
run_arm lr3e3 --learning_rate 3e-3
run_arm hvc64tok16 --hidden_variable_codimension 64 \
  --attention_token_dim 16 --learning_rate 2e-3
touch /tmp/codano_probe.done
note "codano probe complete"
