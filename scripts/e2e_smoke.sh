#!/usr/bin/env bash
# Full-pipeline smoke drive on the runnable micro dataset:
#   fixture -> pitch -> train-align -> align -> train (3 stages) ->
#   convert -> voicepack -> speak
# CPU, small model. ~10 min (XLA compiles dominate).
set -ex
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/stylish_e2e}
rm -rf "$WORK"
mkdir -p "$WORK"

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - "$WORK" <<'EOF'
import sys, os
sys.path.insert(0, "tests")
from fixtures import make_micro_dataset
work = sys.argv[1]
make_micro_dataset(os.path.join(work, "data"), with_caches=False,
                   uniform_duration=True)
# write run config pointing at the dataset
import yaml
cfg = {
  "training": {"log_interval": 5, "save_interval": 50, "val_interval": 50,
                "device": "cpu", "mixed_precision": "no", "data_workers": 0},
  "training_plan": {
    "alignment": {"epochs": 2, "probe_batch_max": 4, "lr": 1e-4},
    "acoustic": {"epochs": 1, "probe_batch_max": 2, "lr": 1e-4},
    "textual": {"epochs": 1, "probe_batch_max": 2, "lr": 3e-5},
    "duration": {"epochs": 1, "probe_batch_max": 2, "lr": 1e-4},
  },
  "dataset": {"path": os.path.join(work, "data"),
               "train_data": "train-list.txt", "val_data": "val-list.txt",
               "wav_path": "wav-dir", "pitch_path": "pitch.safetensors",
               "alignment_path": "alignment.safetensors",
               "alignment_model_path": "alignment_model.safetensors"},
  "validation": {"sample_count": 2},
}
open(os.path.join(work, "config.yml"), "w").write(yaml.dump(cfg))
# model-small + explicit opt-in to the structural-only random WavLM
# (slm weight > 0 with no local weights errors out otherwise)
mdl = yaml.safe_load(open("configs/model-small.yml"))
mdl.setdefault("slm", {})["allow_random_fallback"] = True
open(os.path.join(work, "model.yml"), "w").write(yaml.dump(mdl))
print("fixture ready")
EOF

RUN="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu JAX_DISABLE_MOST_OPTIMIZATIONS=1 python -m stylish_tts_tpu.cli"
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"

$RUN pitch $CFG --out "$WORK/out"
$RUN train-align $CFG --out "$WORK/out"
$RUN align $CFG --out "$WORK/out"
$RUN train $CFG --out "$WORK/out" --stage acoustic
CKPT=$(ls -d "$WORK"/out/duration/checkpoint_* | tail -1)
$RUN convert $CFG --checkpoint "$CKPT" --out "$WORK/package"
$RUN voicepack $CFG --checkpoint "$CKPT" --out "$WORK/voicepack.safetensors"
printf 'ɔnðə kˈɑːntɹɛɹi\nfɚðə fˈɜːst tˈaɪm\n' > "$WORK/doc.txt"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu JAX_DISABLE_MOST_OPTIMIZATIONS=1 python -m stylish_tts_tpu.cli_tts \
  speak --model "$WORK/package" --voicepack "$WORK/voicepack.safetensors" \
  --text "$WORK/doc.txt" --out "$WORK/speech.wav"
ls -la "$WORK/speech.wav"
echo "E2E SMOKE OK"
