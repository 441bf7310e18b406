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

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  python scripts/make_formant_fixture.py "$WORK"

# NOTE: the fixture's config.yml training_plan (epochs etc.) is only
# consumed by the pitch/train-align/align prep below; the ringformer
# acoustic run's epochs come from the EPOCHS arg via e2e_ringformer_tpu.sh.
RUN="python -m stylish_tts_tpu.cli"   # ambient env: real TPU
CFG="--config $WORK/config.yml --model-config $WORK/model.yml"

$RUN pitch $CFG --out "$WORK/out"
$RUN train-align $CFG --out "$WORK/out"
$RUN align $CFG --out "$WORK/out"

scripts/e2e_ringformer_tpu.sh "$WORK" "$RING" "$EPOCHS"
