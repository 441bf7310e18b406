"""Device mesh + sharding for the data-parallel GAN step.

The reference's entire distributed story is HF-Accelerate DDP
(SURVEY.md §2.8: gradient all-reduce in backward, one gather for CTC
priors).  The TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over
the data axis, batches sharded ``P("data")``, train state replicated
``P()``, and ONE jit'd step — XLA inserts the gradient all-reduce
(riding ICI) automatically from the shardings; no NCCL, no wrapper.

Multi-slice scaling later extends the same mesh with a DCN data axis;
model axes (tp) would slot into the same Mesh — the step functions are
already written against logical axis names.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def jit_data_parallel_step(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch) -> (state, metrics) step data-parallel.

    State is replicated, batch is sharded on its leading axis; XLA
    derives the psum of gradients from the sharding constraints.
    """
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
