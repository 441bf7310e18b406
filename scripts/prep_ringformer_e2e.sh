#!/usr/bin/env bash
# Regenerate the formant caches (fixture -> pitch -> train-align -> align)
# needed by e2e_ringformer_tpu.sh when no completed freegan workdir exists
# (e.g. /tmp wiped between sessions), then run the ringformer acoustic e2e.
#   usage: prep_ringformer_e2e.sh [workdir] [ring_workdir] [acoustic_epochs]
set -ex
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/formant_e2e}
RING=${2:-/tmp/formant_ring}
EPOCHS=${3:-40}
rm -rf "$WORK"
mkdir -p "$WORK"

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, "tests")
from fixtures import make_micro_dataset
work = sys.argv[1]
make_micro_dataset(os.path.join(work, "data"), n_train=48, n_val=8,
                   with_caches=True, voice="formant", seed=11)
import yaml
cfg = {
  "training": {"log_interval": 10, "save_interval": 200, "val_interval": 100,
                "device": "tpu", "mixed_precision": "bf16", "data_workers": 2},
  "training_plan": {
    "alignment": {"epochs": 30, "probe_batch_max": 8, "lr": 2e-4},
    "acoustic": {"epochs": 40, "probe_batch_max": 8, "lr": 1e-4},
    "textual": {"epochs": 15, "probe_batch_max": 8, "lr": 3e-5},
    "duration": {"epochs": 15, "probe_batch_max": 8, "lr": 1e-4},
  },
  "dataset": {"path": os.path.join(work, "data"),
               "train_data": "train-list.txt", "val_data": "val-list.txt",
               "wav_path": "wav-dir", "pitch_path": "pitch.safetensors",
               "alignment_path": "alignment.safetensors",
               "alignment_model_path": "alignment_model.safetensors"},
  "validation": {"sample_count": 4},
}
open(os.path.join(work, "config.yml"), "w").write(yaml.dump(cfg))
open(os.path.join(work, "model.yml"), "w").write(
    yaml.dump({"slm": {"allow_random_fallback": True}}))
print("formant fixture ready")
EOF

RUN="python -m stylish_tts_tpu.cli"   # ambient env: real TPU
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"

$RUN pitch $CFG --out "$WORK/out"
$RUN train-align $CFG --out "$WORK/out"
$RUN align $CFG --out "$WORK/out"

scripts/e2e_ringformer_tpu.sh "$WORK" "$RING" "$EPOCHS"
