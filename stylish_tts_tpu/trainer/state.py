"""Training state pytree carried through the jit'd step.

Everything that changes per step lives here (params, optimizer
moments, discriminator-loss EMAs, CTC label-prior accumulators, RNG,
step counter) so the step is a pure function
state x batch -> state x metrics.

The reference spreads this across torch modules, the accelerate
checkpoint registry and python-side attributes (train_context.py:110-113,
losses.py:209-220, 478-653); here it is one replicated pytree.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from .optim import init_disc_ema, init_opt_states


@struct.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: Dict[str, Any]
    disc_ema: Dict[str, jnp.ndarray]
    # CTC label priors ("Less Peaky CTC"); C = n_tokens + 1
    log_priors: jnp.ndarray
    log_priors_sum: jnp.ndarray
    prior_count: jnp.ndarray
    rng: jax.Array
    step: jnp.ndarray
    # Frozen auxiliary weights (e.g. the slm WavLM) ride the state so
    # they enter the jitted step as RUNTIME BUFFERS, not closure
    # constants — a 95M-param fp32 closure bloats the serialized HLO
    # past what the axon remote-compile tunnel accepts (HTTP 413) and
    # would be re-uploaded per program.  Never optimized; stripped from
    # checkpoints (trainer/checkpoint.py) and re-attached at stage start.
    frozen: Dict[str, Any] = struct.field(default_factory=dict)


def create_train_state(
    params: Dict[str, Any], n_classes: int, seed: int = 0
) -> TrainState:
    return TrainState(
        params=params,
        opt_state=init_opt_states(params),
        disc_ema=init_disc_ema(),
        log_priors=jnp.zeros((n_classes,), jnp.float32),
        log_priors_sum=jnp.full((n_classes,), -1e30, jnp.float32),
        prior_count=jnp.zeros((), jnp.float32),
        rng=jax.random.PRNGKey(seed),
        step=jnp.zeros((), jnp.int32),
    )
