#!/bin/bash
# Round-5 endgame: harvest the v3c flagship as soon as it finishes
# (or is drained) — compress the best checkpoint to f16, verify
# eval-equivalence on CPU (no chip contention), run superres + rollout
# on the TPU only while there is time before the drain deadline, and
# append everything to the tracked results journal. Idempotent.
# Usage: DRAIN_AT=$(date -d '22:15' +%s) nohup bash scripts/harvest_flagship_v3c.sh &
cd /root/repo

SAVE_DIR=artifacts/ns128_v3
DRAIN_AT=${DRAIN_AT:?set DRAIN_AT}
note() { echo "[$(date '+%H:%M:%S')] $*" >> /tmp/q5_queue.log; }

until [ -f /tmp/flagship_v3c.done ]; do sleep 60; done
note "harvest: v3c done-file seen"

# 1. f16 compression of the best checkpoint (CPU-side file op + no-eval)
timeout 1200 python scripts/compress_checkpoint.py --dir "$SAVE_DIR" \
  --name best_model --dtype f16 --no-eval > /tmp/q5_compress.log 2>&1
note "harvest: compress rc=$?"

# 2. CPU eval-equivalence: f32 vs f16 on 512 test pairs under the run's
#    own sidecar normalizers
PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 python scripts/eval_ns_checkpoint.py \
  --save_dir "$SAVE_DIR" --save_name best_model --n_test 512 \
  > /tmp/q5_eval_f32.log 2>&1
note "harvest: f32 eval rc=$? $(tail -1 /tmp/q5_eval_f32.log)"
PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 python scripts/eval_ns_checkpoint.py \
  --save_dir "$SAVE_DIR" --save_name best_model_f16 --n_test 512 \
  > /tmp/q5_eval_f16.log 2>&1
note "harvest: f16 eval rc=$? $(tail -1 /tmp/q5_eval_f16.log)"

# 3. TPU superres + rollout only if >20 min remain before drain
if [ $(( DRAIN_AT - $(date +%s) )) -gt 1200 ]; then
  timeout 1800 python scripts/eval_ns_superres.py --save_dir "$SAVE_DIR" \
    --eval_res [128,256,512] > /tmp/q5_superres.log 2>&1
  note "harvest: superres rc=$?"
  timeout 900 python scripts/eval_ns_rollout.py --save_dir "$SAVE_DIR" \
    > /tmp/q5_rollout.log 2>&1
  note "harvest: rollout rc=$?"
else
  note "harvest: skipping TPU evals (inside drain window)"
fi

python - <<'EOF'
import json, pathlib
man = json.loads(pathlib.Path("artifacts/ns128_v3/manifest.json").read_text())
entry = {
    "run": "flagship_v3c_40k_pinned_normalizer",
    "round": 5,
    "script": "scripts/run_flagship_v3c.sh",
    "manifest": man,
}
for tag in ("f32", "f16"):
    try:
        line = pathlib.Path(f"/tmp/q5_eval_{tag}.log").read_text().strip().splitlines()[-1]
        entry[f"cpu_eval_{tag}"] = line
    except Exception:
        pass
with open("artifacts/results.jsonl", "a") as f:
    f.write(json.dumps(entry) + "\n")
print("journal appended:", entry)
EOF
# 4. make the harvest durable even if the interactive session is gone:
#    track BOTH the exact f32 best (the headline a fresh VM must
#    reproduce — f16 costs real quality at 2e-4 error levels: v2
#    measured f32 1.97e-4 vs f16 3.35e-4 under its own stats) and the
#    compact f16, + sidecars + journal (artifacts/.gitignore excludes
#    *.msgpack; flagship bests are committed explicitly per README)
git add -f "$SAVE_DIR/best_model.msgpack" "$SAVE_DIR/best_model_f16.msgpack" 2>/dev/null
git add "$SAVE_DIR/manifest.json" "$SAVE_DIR/best_model_metadata.json" \
        "$SAVE_DIR/model_metadata.json" "$SAVE_DIR/data_processor.json" \
        artifacts/results.jsonl 2>/dev/null
git commit -q -m "Harvest flagship v3c: tracked f16 best checkpoint, manifest, sidecar, journal" \
  && note "harvest: committed" || note "harvest: nothing to commit"

note "harvest: complete"
touch /tmp/q5_harvest.done
