"""Per-stage validation functions (pure eval, no updates).

Parity with the reference validate fns (reference:
stage_type.py:293-326 alignment w/ forced-align confidence,
376-390 acoustic, 451-468 textual, 557-633 duration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import losses as L
from ..ops import ctc as ctc_ops
from .state import TrainState
from .steps import Batch, StepContext, _acoustic_features


def validate_alignment(state: TrainState, ctx: StepContext, batch: Batch):
    mel = ctx.norm_mel(batch.audio_gt, ctx.to_align_mel)
    mel = jnp.moveaxis(mel, 1, 2)
    mel_lengths = jnp.full((mel.shape[0],), mel.shape[1], jnp.int32)
    log_probs = ctx.models["text_aligner"].apply(
        state.params["text_aligner"], mel, mel_lengths
    )
    loss = ctc_ops.ctc_loss_with_priors(
        log_probs, mel_lengths, batch.text, batch.text_lengths,
        blank_id=ctx.blank_id,
    )
    res = ctc_ops.ctc_forced_align(
        log_probs, mel_lengths, batch.text, batch.text_lengths,
        blank_id=ctx.blank_id,
    )
    confidence = jnp.mean(jnp.exp(res.scores))
    return {"align_loss": loss, "confidence": confidence}, None


def validate_acoustic(state: TrainState, ctx: StepContext, batch: Batch):
    mel, style_mel, energy, pitch, alignment, frames = _acoustic_features(
        ctx, batch
    )
    audio_t = batch.audio_gt[:, : frames * ctx.mc.hop_length]
    style = ctx.models["speech_style_encoder"].apply(
        state.params["speech_style_encoder"], style_mel
    )
    voiced = (pitch > 20.0).astype(jnp.float32)
    pred = ctx.models["speech_predictor"].apply(
        state.params["speech_predictor"],
        batch.text, batch.text_lengths, alignment, pitch, energy, voiced,
        style, pitch, rng=jax.random.PRNGKey(0),
    )
    feats_t = ctx.multi_spec(audio_t)
    feats_p = ctx.multi_spec(pred.audio)
    return (
        {"mel": L.spectral_convergence_loss(feats_t.mel, feats_p.mel)},
        pred.audio,
    )


def validate_textual(state: TrainState, ctx: StepContext, batch: Batch):
    mel, style_mel, energy, pitch, alignment, frames = _acoustic_features(
        ctx, batch
    )
    audio_t = batch.audio_gt[:, : frames * ctx.mc.hop_length]
    pe_style = ctx.models["pe_style_encoder"].apply(
        state.params["pe_style_encoder"], style_mel, pitch, energy
    )
    pred_pitch, pred_energy = ctx.models["pitch_energy_predictor"].apply(
        state.params["pitch_energy_predictor"],
        batch.text, batch.text_lengths, alignment, pe_style,
    )
    style = ctx.models["speech_style_encoder"].apply(
        state.params["speech_style_encoder"], style_mel
    )
    pred_voiced = (pred_pitch > 20.0).astype(jnp.float32)
    pred = ctx.models["speech_predictor"].apply(
        state.params["speech_predictor"],
        batch.text, batch.text_lengths, alignment, pred_pitch, pred_energy,
        pred_voiced, style, pred_pitch, rng=jax.random.PRNGKey(0),
    )
    feats_t = ctx.multi_spec(audio_t)
    feats_p = ctx.multi_spec(pred.audio)
    metrics = {"mel": L.spectral_convergence_loss(feats_t.mel, feats_p.mel)}
    metrics.update(
        L.pitch_energy_losses(pred_pitch, pitch, pred_energy, energy)
    )
    return metrics, pred.audio


def validate_duration(state: TrainState, ctx: StepContext, batch: Batch):
    style_mel = ctx.norm_mel(batch.audio_gt, ctx.to_style_mel)
    target_dur = batch.durations.astype(jnp.float32)
    targets = ctx.duration_processor.dur_to_class(batch.durations)
    dstyle = ctx.models["duration_style_encoder"].apply(
        state.params["duration_style_encoder"], style_mel
    )
    duration_raw = ctx.models["duration_predictor"].apply(
        state.params["duration_predictor"],
        batch.text, batch.text_lengths, dstyle,
    )
    duration = ctx.duration_processor.prediction_to_duration(
        duration_raw, batch.text_lengths
    )
    dur_l1 = L.masked_smooth_l1_per_sequence(
        duration, target_dur, batch.text_lengths
    )
    ce = L.duration_ce_loss(
        duration_raw, targets, batch.text_lengths,
        jnp.ones((duration_raw.shape[-1],)),
    )
    # full text->audio with *predicted* durations (reference
    # stage_type.py:593-622); audio grid uses the same static frame count
    frames = style_mel.shape[-1]
    alignment = ctx.duration_processor.duration_to_alignment(duration, frames)
    mel = ctx.norm_mel(batch.audio_gt, ctx.to_mel)
    energy = ctx.energy_from_mel(mel)
    pitch = batch.pitch[:, :frames]
    pe_style = ctx.models["pe_style_encoder"].apply(
        state.params["pe_style_encoder"], style_mel, pitch, energy
    )
    pred_pitch, pred_energy = ctx.models["pitch_energy_predictor"].apply(
        state.params["pitch_energy_predictor"],
        batch.text, batch.text_lengths, alignment, pe_style,
    )
    style = ctx.models["speech_style_encoder"].apply(
        state.params["speech_style_encoder"], style_mel
    )
    pred_voiced = (pred_pitch > 20.0).astype(jnp.float32)
    pred = ctx.models["speech_predictor"].apply(
        state.params["speech_predictor"],
        batch.text, batch.text_lengths, alignment, pred_pitch, pred_energy,
        pred_voiced, style, pred_pitch, rng=jax.random.PRNGKey(0),
    )
    return {"duration": dur_l1, "duration_ce": ce}, pred.audio


VALIDATORS = {
    "alignment": validate_alignment,
    "acoustic": validate_acoustic,
    "textual": validate_textual,
    "duration": validate_duration,
}
