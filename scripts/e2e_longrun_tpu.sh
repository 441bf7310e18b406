#!/usr/bin/env bash
# Long-horizon training evidence (VERDICT r4 item 4): >=10k acoustic
# G+D steps on the multibin corpus, real TPU, checkpoint-resumable.
# Reports: loss trajectories, gap-aware disc-LR multiplier occupancy vs
# the 50k-step simulation envelope (scripts/simulate_ema_cadence.py),
# NaN watch, and a mid-run checkpoint resume.
#   usage: e2e_longrun_tpu.sh [workdir] [epochs]
# Reuses an existing corpus + checkpoints when present: re-invoking the
# script after an interruption resumes from the latest checkpoint
# (trainer/loop.py manifest fast-forward), which is itself part of the
# evidence this run exists to produce.
set -ex
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/formant_longrun}
EPOCHS=${2:-400}
mkdir -p "$WORK"

if [ ! -f "$WORK/data/alignment.safetensors" ]; then
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, "tests")
from fixtures import make_micro_dataset
work = sys.argv[1]
# same corpus recipe as e2e_multibin_tpu.sh: 9 duration bins, so the
# warm compile cache from that measurement is reusable here
make_micro_dataset(
    os.path.join(work, "data"), n_train=500, n_val=20,
    with_caches=True, voice="formant", seed=23,
    target_s_choices=[0.9, 1.15, 1.4, 1.65, 1.9, 2.15, 2.4, 2.65, 2.9],
    # caches bake the padded length: must match the run's
    # dataset.time_bin_quantize below
    time_bin_quantize=4,
)
print("longrun corpus ready")
EOF
fi

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$WORK" "$EPOCHS" <<'EOF'
import sys, os, yaml
work, epochs = sys.argv[1], int(sys.argv[2])
cfg = {
  "training": {"log_interval": 10, "save_interval": 1000,
               "val_interval": 4000, "device": "tpu",
               "mixed_precision": "bf16", "data_workers": 2},
  "training_plan": {
    "acoustic": {"epochs": epochs, "probe_batch_max": 16, "lr": 1e-4},
  },
  # time_bin_quantize=4: group the 9 quarter-second duration bins into
  # ~3 one-second bins — each occupied (bin, stage) pair is a fresh XLA
  # program and the remote-compile tunnel runs ~25 min/program, so the
  # compile head has to be bounded for a >=10k-step run to fit a session
  "dataset": {"path": os.path.join(work, "data"),
              "train_data": "train-list.txt", "val_data": "val-list.txt",
              "wav_path": "wav-dir", "pitch_path": "pitch.safetensors",
              "alignment_path": "alignment.safetensors",
              "time_bin_quantize": 4},
  "validation": {"sample_count": 2},
}
open(os.path.join(work, "config.yml"), "w").write(yaml.dump(cfg))
open(os.path.join(work, "model.yml"), "w").write(
    yaml.dump({"slm": {"allow_random_fallback": True}}))
print("longrun config ready:", epochs, "epochs")
EOF

RUN="python -m stylish_tts_tpu.cli"   # ambient env: real TPU
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"

# resume from the latest checkpoint if one exists
CKPT=""
LATEST=$(ls -d "$WORK"/out/acoustic/checkpoint_* 2>/dev/null | sort | tail -1 || true)
if [ -n "$LATEST" ]; then CKPT="--checkpoint $LATEST"; fi

LOG="$WORK/train_drive.log"
timeout 28800 $RUN train $CFG --stage acoustic --out "$WORK/out" $CKPT \
  > "$LOG" 2>&1 &
pid=$!
echo $pid > "$WORK/run.pid"
while kill -0 "$pid" 2>/dev/null; do
  if grep -q "stage acoustic done" "$LOG" 2>/dev/null; then
    sleep 2; kill "$pid" 2>/dev/null; wait "$pid" 2>/dev/null || true; break
  fi
  sleep 30
done
tail -3 "$WORK/out/acoustic/train.log" || true
echo "LONGRUN DRIVE DONE"
