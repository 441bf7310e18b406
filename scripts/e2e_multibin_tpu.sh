#!/usr/bin/env bash
# Compile-budget + scale evidence on a realistic multi-bin corpus
# (VERDICT r3 item 4): 520 formant segments spanning >=9 duration bins,
# acoustic stage >=2k G+D steps on the real TPU, measured twice:
#   run 1: FRESH compile cache -> total fresh-compile wall, programs/stage
#   run 2: same config, warm cache -> cache-hit startup cost
# Report lands in $WORK/report.txt; PERF.md round 4 summarizes it.
#   usage: e2e_multibin_tpu.sh [workdir] [acoustic_epochs]
set -ex
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/formant_multibin}
EPOCHS=${2:-42}
rm -rf "$WORK"
mkdir -p "$WORK"

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$WORK" "$EPOCHS" <<'EOF'
import sys, os
sys.path.insert(0, "tests")
from fixtures import make_micro_dataset
work, epochs = sys.argv[1], int(sys.argv[2])
# 9 target lengths -> 9 duration bins (0.25 s steps)
make_micro_dataset(
    os.path.join(work, "data"), n_train=500, n_val=20,
    with_caches=True, voice="formant", seed=23,
    target_s_choices=[0.9, 1.15, 1.4, 1.65, 1.9, 2.15, 2.4, 2.65, 2.9],
)
import yaml
cfg = {
  "training": {"log_interval": 50, "save_interval": 4000,
                "val_interval": 2000, "device": "tpu",
                "mixed_precision": "bf16", "data_workers": 2},
  "training_plan": {
    "acoustic": {"epochs": epochs, "probe_batch_max": 16, "lr": 1e-4},
  },
  "dataset": {"path": os.path.join(work, "data"),
               "train_data": "train-list.txt", "val_data": "val-list.txt",
               "wav_path": "wav-dir", "pitch_path": "pitch.safetensors",
               "alignment_path": "alignment.safetensors"},
  "validation": {"sample_count": 2},
}
open(os.path.join(work, "config.yml"), "w").write(yaml.dump(cfg))
open(os.path.join(work, "model.yml"), "w").write(
    yaml.dump({"slm": {"allow_random_fallback": True}}))
print("multibin fixture ready:", epochs, "epochs")
EOF

RUN="python -m stylish_tts_tpu.cli"   # ambient env: real TPU
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"
FRESH_CACHE="$WORK/xla_cache"

# The trainer auto-advances acoustic -> textual -> duration (reference
# stage-chain semantics, train/loop.py). This measurement wants the
# acoustic stage in isolation, so stop the run as soon as the stage
# completes instead of letting it start compiling textual programs.
run_until_acoustic_done() {  # $1 = out dir, $2 = log file
  STYLISH_TPU_CACHE="$FRESH_CACHE" timeout 10800 \
    $RUN train $CFG --stage acoustic --out "$1" > "$2" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    if grep -q "stage acoustic done" "$2" 2>/dev/null; then
      sleep 2; kill "$pid" 2>/dev/null; wait "$pid" 2>/dev/null; break
    fi
    sleep 10
  done
}

# ---- run 1: cold cache -------------------------------------------------
T0=$(date +%s)
run_until_acoustic_done "$WORK/out_cold" "$WORK/train_cold.log"
T1=$(date +%s)

# ---- run 2: warm cache, fresh workdir ---------------------------------
run_until_acoustic_done "$WORK/out_warm" "$WORK/train_warm.log"
T2=$(date +%s)

{
  echo "cold-cache acoustic stage wall_s: $((T1 - T0))"
  echo "warm-cache acoustic stage wall_s: $((T2 - T1))"
  echo "compile-cache entries (programs persisted): $(ls "$FRESH_CACHE" | wc -l)"
  echo "train bins occupied:"
  grep -o 'bin [0-9]*' "$WORK/train_cold.log" | sort | uniq -c | head -20 || true
  echo "last losses (cold):"; tail -5 "$WORK/out_cold/acoustic/train.log" || true
  echo "last losses (warm):"; tail -5 "$WORK/out_warm/acoustic/train.log" || true
} | tee "$WORK/report.txt"
