#!/usr/bin/env bash
# Full pipeline on FORMANT-SYNTHESIZED speech, full-size model, real TPU,
# slm loss enabled (random-init WavLM fallback under zero egress):
#   fixture -> pitch -> train-align -> align (scored vs ground truth) ->
#   train (acoustic/textual/duration) -> convert -> voicepack -> speak
# Run in background; TPU compiles dominate the first hour.
set -ex
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/formant_e2e}
rm -rf "$WORK"
mkdir -p "$WORK"

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/make_formant_fixture.py "$WORK"

RUN="python -m stylish_tts_tpu.cli"   # ambient env: real TPU
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"

$RUN pitch $CFG --out "$WORK/out"
$RUN train-align $CFG --out "$WORK/out"
$RUN align $CFG --out "$WORK/out"
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/score_alignment.py "$WORK/data" | tee "$WORK/alignment_score.json"

# attribution diff: same trained aligner, --method torch into a second
# cache, per-token diff of the two methods on identical posteriors
python - "$WORK" <<'EOF'
import sys, yaml
work = sys.argv[1]
cfg = yaml.safe_load(open(f"{work}/config.yml"))
cfg["dataset"]["alignment_path"] = "alignment_torch.safetensors"
open(f"{work}/config_torch_attr.yml", "w").write(yaml.dump(cfg))
EOF
$RUN align --config "$WORK/config_torch_attr.yml" --model-config "$WORK/model.yml" \
  --out "$WORK/out_torch_attr" --method torch
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/score_alignment.py --attribution-diff \
  "$WORK/data/alignment.safetensors" "$WORK/data/alignment_torch.safetensors" \
  | tee "$WORK/attribution_diff.json"
$RUN train $CFG --out "$WORK/out" --stage acoustic
CKPT=$(ls -d "$WORK"/out/duration/checkpoint_* | tail -1)
$RUN convert $CFG --checkpoint "$CKPT" --out "$WORK/package"
$RUN voicepack $CFG --checkpoint "$CKPT" --out "$WORK/voicepack.safetensors"
printf 'ɔnðə kˈɑːntɹɛɹi\nnɑkzi tʊmɜn dʊvɔs\n' > "$WORK/doc.txt"
python -m stylish_tts_tpu.cli_tts \
  speak --model "$WORK/package" --voicepack "$WORK/voicepack.safetensors" \
  --text "$WORK/doc.txt" --out "$WORK/speech.wav"
ls -la "$WORK/speech.wav"
echo "FORMANT E2E OK"
