"""Loss library (pure functions over features and discriminator scores).

Capability parity with the reference loss zoo
(reference: train/losses.py):
  * multi-resolution spectral convergence ("mel", losses.py:17-38)
  * anti-wrapping multi-phase loss (losses.py:41-91)
  * log-magnitude + phase loss (MagPhaseLoss, losses.py:94-163)
  * LSGAN + TPRLS generator/discriminator losses with the same
    per-discriminator composition (losses.py:166-373)
  * duration cross-entropy with sqrt inverse-frequency weights
    (losses.py:430-446)
  * smooth-L1 pitch/energy losses with delta terms
    (stage_type.py:231-255)
  * loss-magnitude-normalized total ("backwards loss",
    loss_log.py:82-94)

Everything is shape-static and jit-safe: boolean index selections are
replaced by masked means.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * math.pi


# --------------------------------------------------------------------------
# Spectral losses
# --------------------------------------------------------------------------


def spectral_convergence_loss(
    target_list: Sequence[jnp.ndarray], pred_list: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Multi-resolution L1 spectral convergence over log-mel mags ("mel")."""
    loss = 0.0
    for target, pred in zip(target_list, pred_list):
        target = jax.lax.stop_gradient(target)
        num = jnp.sum(jnp.abs(target - pred))
        den = jnp.sum(jnp.abs(target)) + 1e-6
        loss = loss + num / den
    return loss / len(target_list)


def _anti_wrapping(phase_diff: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    wrapped = jnp.abs(
        phase_diff - TWO_PI * jnp.round(phase_diff / TWO_PI)
    )
    return wrapped * weights


def differential_phase_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Frequency-weighted anti-wrapping |dphi| + d/df + d/dt terms.

    pred/target: (B, freq, frames).
    """
    target = jax.lax.stop_gradient(target)
    freq_size = target.shape[1]
    base = math.exp(math.log(2.5) / (freq_size // 2))
    weights = jnp.power(base, jnp.arange(freq_size, dtype=jnp.float32))
    weights = weights[None, :, None]

    loss = jnp.mean(_anti_wrapping(pred - target, weights))
    pred_df = jnp.diff(pred, axis=1)
    target_df = jnp.diff(target, axis=1)
    loss += jnp.mean(_anti_wrapping(pred_df - target_df, weights[:, :-1, :]))
    pred_dt = jnp.diff(pred, axis=2)
    target_dt = jnp.diff(target, axis=2)
    loss += jnp.mean(_anti_wrapping(pred_dt - target_dt, weights))
    return loss


def multi_phase_loss(
    pred_list: Sequence[jnp.ndarray], target_list: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    loss = 0.0
    for pred, target in zip(pred_list, target_list):
        loss = loss + differential_phase_loss(pred, target)
    return loss / len(pred_list)


def magphase_loss(
    pred_magnitude: jnp.ndarray,  # (B, freq, frames) log-magnitude
    pred_phase: jnp.ndarray,
    target_real: jnp.ndarray,
    target_imag: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Log-magnitude L1 + differential phase loss vs a target STFT
    (dormant in the reference: constructed train_context.py:142-146 but
    body disabled stage_type.py:227-229; implemented for parity)."""
    target_mag = jnp.sqrt(target_real**2 + target_imag**2) + 1e-14
    mask = jax.lax.stop_gradient((target_mag > 1e-3).astype(jnp.float32))
    target_phase = mask * jnp.arctan2(target_imag, target_real)
    mag = jnp.mean(jnp.abs(pred_magnitude - jnp.log(target_mag + 1e-9)))
    phase = differential_phase_loss(mask * pred_phase, target_phase)
    return {"mag": mag, "phase": phase}


# --------------------------------------------------------------------------
# Adversarial losses (LSGAN + TPRLS)
# --------------------------------------------------------------------------

DISC_AUDIO_WEIGHT = 3.0  # reference losses.py:14 disc_weight


def _median_lower(x: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics: the LOWER of the two middle order statistics
    for even-sized inputs (jnp.median averages them). The median value
    shifts the TPRLS truncation mask, so matching the reference's
    element-vs-average choice matters for training-trajectory parity
    (tests/test_train_parity_trajectory.py)."""
    flat = x.reshape(-1)
    return jnp.sort(flat)[(flat.size - 1) // 2]


def _tprls(real: jnp.ndarray, fake: jnp.ndarray, tau: float = 0.04) -> jnp.ndarray:
    """Relativistic truncated pairing loss (masked-mean formulation)."""
    diff = real - fake
    m = _median_lower(diff)
    keep = (real < fake + m).astype(jnp.float32)
    sq = jnp.square(diff - m) * keep
    l_rel = jnp.sum(sq) / (sq.size + 1e-9)
    return tau - jax.nn.relu(tau - l_rel)


def _tprls_gen(real: jnp.ndarray, fake: jnp.ndarray, tau: float = 0.04) -> jnp.ndarray:
    # generator-side variant (reference losses.py:354-361 swaps roles and
    # uses a masked mean instead of a masked sum/total-size)
    diff = fake - real
    m = _median_lower(diff)
    keep = (fake < real + m).astype(jnp.float32)
    sq = jnp.square(diff - m) * keep
    l_rel = jnp.sum(sq) / (jnp.sum(keep) + 1e-9)
    return tau - jax.nn.relu(tau - l_rel)


def discriminator_pair_loss(
    real_scores: List[jnp.ndarray], fake_scores: List[jnp.ndarray]
) -> tuple:
    """LSGAN (1-real)^2 + fake^2 summed over score heads + TPRLS.

    Returns (loss_with_tprls, raw_lsgan_loss) — the raw term feeds the
    gap-aware LR EMA (reference losses.py:287 uses the pre-TPRLS value).
    """
    loss = 0.0
    tprls = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        loss = loss + jnp.mean(jnp.square(1.0 - dr)) + jnp.mean(jnp.square(dg))
        tprls = tprls + _tprls(dr, dg)
    return loss + tprls, loss


def generator_pair_loss(
    real_scores: List[jnp.ndarray], fake_scores: List[jnp.ndarray]
) -> jnp.ndarray:
    """LSGAN (1-fake)^2 + TPRLS (generator side)."""
    loss = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        loss = loss + jnp.mean(jnp.square(1.0 - dg))
        loss = loss + _tprls_gen(dr, dg)
    return loss


def disc_lr_multiplier(
    last_loss: jnp.ndarray,
    sub_count: float,
    f_max: float = 4.0,
    h_min: float = 0.01,
) -> jnp.ndarray:
    """Gap-aware discriminator LR multiplier (reference losses.py:238-249).

    Ideal loss is 0.5 per score head; the multiplier pushes the
    discriminator harder when it is losing (loss above ideal) and backs
    off when it is winning.
    """
    ideal = 0.5 * sub_count
    x_band = 0.05 * sub_count
    x = jnp.abs(last_loss - ideal)
    above = jnp.minimum(jnp.power(f_max, x / x_band), f_max)
    below = jnp.maximum(jnp.power(h_min, x / x_band), h_min)
    mult = jnp.where(last_loss > ideal, above, below)
    mult = jnp.where(last_loss > ideal + x_band, f_max, mult)
    mult = jnp.where(last_loss < ideal - x_band, h_min, mult)
    return mult


# --------------------------------------------------------------------------
# Prosody / duration losses
# --------------------------------------------------------------------------


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    diff = pred - jax.lax.stop_gradient(target)
    abs_diff = jnp.abs(diff)
    return jnp.mean(
        jnp.where(abs_diff < 1.0, 0.5 * diff * diff, abs_diff - 0.5)
    )


def pitch_energy_losses(
    pred_pitch, pitch, pred_energy, energy
) -> Dict[str, jnp.ndarray]:
    """Smooth-L1 + delta smooth-L1 (reference stage_type.py:231-255)."""
    pitch_loss = smooth_l1(pred_pitch, pitch) + smooth_l1(
        jnp.diff(pred_pitch, axis=-1), jnp.diff(pitch, axis=-1)
    )
    energy_loss = smooth_l1(pred_energy, energy) + smooth_l1(
        jnp.diff(pred_energy, axis=-1), jnp.diff(energy, axis=-1)
    )
    return {"pitch": pitch_loss, "energy": energy_loss}


def duration_ce_loss(
    pred: jnp.ndarray,  # (B, T, classes) logits
    target_classes: jnp.ndarray,  # (B, T) int
    text_lengths: jnp.ndarray,  # (B,)
    class_weights: jnp.ndarray,  # (classes,) sqrt inverse-frequency
) -> jnp.ndarray:
    """Per-sequence weighted CE averaged over the batch
    (reference losses.py:430-446: torch CrossEntropyLoss(weight=sqrt(w))
    applied per sequence)."""
    logz = jax.nn.log_softmax(pred, axis=-1)
    picked = jnp.take_along_axis(logz, target_classes[..., None], axis=-1)[..., 0]
    w = class_weights[target_classes]  # (B, T)
    mask = (
        jnp.arange(pred.shape[1])[None, :] < text_lengths[:, None]
    ).astype(jnp.float32)
    # torch CE with weights: sum(w*nll)/sum(w) per sequence
    num = jnp.sum(-picked * w * mask, axis=1)
    den = jnp.sum(w * mask, axis=1) + 1e-9
    return jnp.mean(num / den)


def masked_smooth_l1_per_sequence(
    pred: jnp.ndarray, target: jnp.ndarray, lengths: jnp.ndarray
) -> jnp.ndarray:
    """Mean over batch of per-sequence masked smooth-L1
    (reference stage_type.py:517-522 duration loss)."""
    diff = pred - jax.lax.stop_gradient(target)
    abs_diff = jnp.abs(diff)
    elem = jnp.where(abs_diff < 1.0, 0.5 * diff * diff, abs_diff - 0.5)
    mask = (
        jnp.arange(pred.shape[1])[None, :] < lengths[:, None]
    ).astype(jnp.float32)
    per_seq = jnp.sum(elem * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1.0
    )
    return jnp.mean(per_seq)


# --------------------------------------------------------------------------
# Weighted total ("backwards loss")
# --------------------------------------------------------------------------

# losses that keep their raw magnitude in the backward pass
UNNORMALIZED_KEYS = ("generator", "align_loss")


def backwards_loss(
    metrics: Dict[str, jnp.ndarray], weights: Dict[str, float]
) -> jnp.ndarray:
    """Loss-magnitude-normalized weighted total (loss_log.py:82-94).

    Each loss except generator/align_loss contributes
    w * L / stop_grad(L): unit magnitude, direction preserved.
    """
    total = 0.0
    for key, value in metrics.items():
        if key in UNNORMALIZED_KEYS:
            term = value
        else:
            term = value / (jax.lax.stop_gradient(value) + 1e-9)
        total = total + weights.get(key, 1.0) * term
    return total


def reporting_total(
    metrics: Dict[str, jnp.ndarray], weights: Dict[str, float]
) -> jnp.ndarray:
    """Raw weighted sum used for logging (loss_log.py:72-80)."""
    total = 0.0
    for key, value in metrics.items():
        total = total + weights.get(key, 1.0) * value
    return total
