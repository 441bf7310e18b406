"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
XLA_FLAGS=--xla_force_host_platform_device_count (SURVEY.md §4).
"""

import os

# Force CPU even when the ambient env points at a TPU (the suite is
# designed for the virtual 8-device mesh; running it through a remote
# TPU tunnel is slow and numerically looser).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # 8 virtual device threads on a 1-2 core host can legitimately drift
    # minutes apart; XLA's default 40 s rendezvous terminate timeout then
    # aborts the whole process mid-collective.
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The env-var write above is not always enough: the ambient environment
# may export JAX_PLATFORMS=axon and register the TPU PJRT plugin from
# sitecustomize before conftest runs, in which case jax's config has
# already captured the env value. Forcing the config directly wins as
# long as no backend has been initialized yet (nothing in this process
# touches devices before pytest imports conftest).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
