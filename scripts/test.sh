#!/usr/bin/env bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# PALLAS_AXON_POOL_IPS must be unset BEFORE the interpreter starts:
# sitecustomize.py registers the axon TPU PJRT plugin (a slow tunnel
# handshake) whenever it is set, which taxes every python start by
# minutes.  CPU tests don't need the TPU at all.
set -e
cd "$(dirname "$0")/.."
exec env -u PALLAS_AXON_POOL_IPS \
    JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_cpu_collective_call_terminate_timeout_seconds=1200" \
    python -m pytest tests/ -x -q "$@"
