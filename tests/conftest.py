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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env-var write above is not always enough: the ambient environment
# may export JAX_PLATFORMS=axon and register the TPU PJRT plugin from
# sitecustomize before conftest runs, in which case jax's config has
# already captured the env value. Forcing the config directly wins as
# long as no backend has been initialized yet (nothing in this process
# touches devices before pytest imports conftest).
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
