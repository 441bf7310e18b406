#!/usr/bin/env bash
# Resume of e2e_formant_tpu.sh after the train stage: caches already built.
set -ex
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/formant_e2e}
RUN="python -m stylish_tts_tpu.cli"
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"
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
