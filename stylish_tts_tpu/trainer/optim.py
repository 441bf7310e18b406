"""Per-module optimization: AdamW + cosine schedule + gap-aware disc LR.

Capability parity with the reference MultiOptimizer
(reference: train/optimizers.py): one AdamW per module
(betas (0.85, 0.99), eps 1e-9, weight decay 1e-4,
optimizers.py:132-136), a cosine schedule over 10k logical steps
rescaled to the stage length with a plateau at 90%
(optimizers.py:96-103), and discriminator LR = generator LR x a
gap-aware multiplier recomputed every step (optimizers.py:54-65).

TPU-native: the learning rate is a traced scalar fed into the jit'd
step (one compiled program per stage, no Python-side param-group
mutation); the gap multiplier is computed inside the step from the
discriminator-loss EMA carried in TrainState.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

LOGICAL_STEP_LIMIT = 10_000
PLATEAU = 0.9

ADAM_B1 = 0.85
ADAM_B2 = 0.99
ADAM_EPS = 1e-9
WEIGHT_DECAY = 1e-4


def make_optimizer() -> optax.GradientTransformation:
    """LR-less AdamW core; the step scales updates by the live LR."""
    return optax.chain(
        optax.scale_by_adam(b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS),
        optax.add_decayed_weights(WEIGHT_DECAY),
    )


def init_opt_states(params: Dict[str, Any]) -> Dict[str, Any]:
    tx = make_optimizer()
    return {name: tx.init(p) for name, p in params.items()}


def apply_module_update(
    params: Any, opt_state: Any, grads: Any, lr: jnp.ndarray
) -> tuple:
    """One AdamW step on a single module's params with a traced LR.

    Nonfinite-grad guard: if ANY gradient entry of this module is
    inf/nan, the whole module update becomes a no-op (params AND
    optimizer moments keep their old values). This is the TPU-native
    analogue of torch.amp.GradScaler's skip-on-inf step (the reference
    threads a scaler through MultiOptimizer.step, optimizers.py:79-90):
    in bf16 a single pathological batch can spike one gradient to inf,
    and without the guard that one step poisons the parameters forever
    — the round-5 long-horizon run died exactly this way at step ~1,906
    after 1,900 healthy steps, deterministically reproducible.
    """
    tx = make_optimizer()
    updates, new_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(params, updates)
    finite = jnp.all(
        jnp.asarray([
            jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)
        ])
    )
    pick = lambda new, old: jax.tree.map(  # noqa: E731
        lambda n, o: jnp.where(finite, n, o), new, old
    )
    return pick(new_params, params), pick(new_state, opt_state)


def cosine_lr(base_lr, step: jnp.ndarray, stage_steps) -> jnp.ndarray:
    """Cosine decay over the stage, expressed in 10k logical steps with a
    plateau at 90% (reference optimizers.py:96-103).

    ``base_lr`` / ``stage_steps`` may be python scalars or traced arrays —
    the trainer passes them from ``TrainState.frozen["schedule"]`` so the
    compiled step is reusable across stage lengths and LRs (as python
    constants every epochs/lr change costs a full recompile, ~5-17 min
    through the axon remote-compile tunnel)."""
    # int64 is disabled by default in jax, so `step * 10_000` would wrap
    # int32 once step >= ~214,749 (long acoustic stages get there). Split
    # off the quotient exactly and do the sub-stage remainder in float32:
    # worst-case error is <1 logical step out of 10k (1e-4 of the cosine).
    steps = jnp.maximum(stage_steps, 1)
    rem = (step % steps).astype(jnp.float32)
    logical = (step // steps) * LOGICAL_STEP_LIMIT + jnp.floor(
        rem * float(LOGICAL_STEP_LIMIT) / steps.astype(jnp.float32)
    ).astype(jnp.int32)
    logical = jnp.minimum(logical, int(LOGICAL_STEP_LIMIT * PLATEAU))
    progress = logical.astype(jnp.float32) / LOGICAL_STEP_LIMIT
    return base_lr * 0.5 * (1.0 + jnp.cos(math.pi * progress))


# EMA sub-counts per discriminator (number of score heads; reference
# losses.py:171-176: mrd/pitch/dur have 5 heads, disc has 1).
DISC_SUB_COUNT = {
    "mrd0": 5.0,
    "mrd1": 5.0,
    "mrd2": 5.0,
    "disc": 1.0,
    "pitch_disc": 5.0,
    "dur_disc": 5.0,
}


def init_disc_ema() -> Dict[str, jnp.ndarray]:
    return {
        name: jnp.asarray(0.5 * count, jnp.float32)
        for name, count in DISC_SUB_COUNT.items()
    }


def update_disc_ema(ema: jnp.ndarray, raw_loss: jnp.ndarray) -> jnp.ndarray:
    """last_loss = 0.95*last + 0.05*loss (reference losses.py:287).

    A nonfinite raw loss (the same pathological step the grad guard in
    apply_module_update skips) leaves the EMA unchanged instead of
    permanently poisoning the gap-aware LR controller."""
    new = ema * 0.95 + jax.lax.stop_gradient(raw_loss) * 0.05
    return jnp.where(jnp.isfinite(new), new, ema)
