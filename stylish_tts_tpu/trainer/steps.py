"""Per-stage jit'd train steps: pure state x batch -> state x metrics.

Stage semantics mirror the reference stage registry
(reference: train/stage_type.py:268-658 and stage.py:104-147):

  alignment: CTC on aligner posteriors w/ label priors; priors
             accumulated in TrainState (losses.py:538-560).
  acoustic:  GT prosody -> speech_predictor -> audio; mel +
             multi-phase + adversarial (3 MRD + waveform disc) + slm;
             then a discriminator step on a per-step random MRD index
             plus the waveform disc, with grads scaled by sqrt(B).
  textual:   predicted pitch/energy through the frozen speech
             predictor; mel + pitch/energy smooth-L1 + pitch adv.
  duration:  duration classes; smooth-L1 + weighted CE + duration adv.

TPU-native: the whole G+D update is ONE compiled program per stage —
the random MRD choice is a traced lax branch, the gap-aware disc LR is
computed from EMAs carried in TrainState, gradient all-reduce is
jax.lax.pmean over the data-parallel mesh axis when present.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import losses as L
from ..dsp.mel import MelSpectrogram
from ..dsp.multi_spectrogram import MultiSpectrogram
from ..ops import ctc as ctc_ops
from ..ops.duration import DurationProcessor
from .optim import (
    DISC_SUB_COUNT,
    apply_module_update,
    cosine_lr,
    update_disc_ema,
)
from .state import TrainState


class Batch(NamedTuple):
    """One fixed-shape (bucketed) training batch."""

    audio_gt: jnp.ndarray  # (B, S) float32, S = frames*hop
    text: jnp.ndarray  # (B, L) int32
    text_lengths: jnp.ndarray  # (B,)
    pitch: jnp.ndarray  # (B, F) float32 F0 Hz
    durations: jnp.ndarray  # (B, L) int32 frames per token
    # optional precomputed GT WavLM hidden states (B, 13, T, 768) f16
    # from the slm cache (dataprep/slm_cache.py); None -> the step
    # embeds GT audio in-line
    slm_gt: Optional[jnp.ndarray] = None


class StepContext:
    """Static step-construction context (models, config, transforms)."""

    def __init__(self, models, model_config, loss_weights, normalization,
                 stage_steps: int = 10_000, base_lr: float = 1e-4,
                 slm_loss_fn=None, axis_name: Optional[str] = None,
                 mixed_precision: bool = False,
                 parity_deterministic: bool = False,
                 parity_prior=None,
                 sampled_mrd_only: bool = True,
                 forced_disc_index: Optional[int] = None):
        # parity_deterministic: neutralize per-step stochastic augmentation
        # (decoder F0/N smoothing, sine-source phase/noise) so the step's
        # trajectory can be compared 1:1 against the torch reference driven
        # with the same neutralizations (tests/test_train_parity_trajectory).
        # parity_prior: fixed broadband excitation injected in place of the
        # harmonic sine prior. The prior is stop-gradient on both frameworks
        # and its *phase spectrum* feeds the generator through atan2 — for a
        # harmonic signal most STFT bins are ~0 and their phase is pure
        # round-off noise, so no two STFT implementations can agree there.
        # A broadband injection keeps every bin well-conditioned; the
        # harmonic prior itself is golden-tested separately.
        # Never used in production training.
        self.parity_deterministic = parity_deterministic
        self.parity_prior = parity_prior
        # See TrainingConfig.sampled_mrd_only (config.py) for semantics.
        self.sampled_mrd_only = sampled_mrd_only
        # forced_disc_index: measurement-only. Bakes the sampled-MRD index
        # to a Python constant so the acoustic step compiles WITHOUT the
        # lax.switch — the resulting executable's XLA cost analysis then
        # reports the FLOPs the step actually executes instead of the sum
        # over all three branches (the root cause of round 3's impossible
        # MFU 1.09; see bench.py). Never used in production training: the
        # per-step random index is what matches the reference
        # (train/stage.py:104-147).
        self.forced_disc_index = forced_disc_index
        self.compute_dtype = jnp.bfloat16 if mixed_precision else jnp.float32
        # Discriminator precision: bf16 32-channel convs are ~30% slower on
        # the MXU than fp32 here, but halve their (4x-tile-padded) HBM
        # footprint — so bf16 discs ride the memory-saver flag
        # (generator.remat), not the speed flag.
        self.disc_dtype = (
            jnp.bfloat16
            if (mixed_precision and model_config.generator.remat)
            else jnp.float32
        )
        mc = model_config
        self.models = models
        self.mc = mc
        self.weights = loss_weights
        self.norm = normalization
        self.stage_steps = stage_steps
        self.base_lr = base_lr
        # (params, target_audio, pred_audio) -> scalar; weights come from
        # state.frozen["wavlm"] at call time (see TrainState.frozen)
        self.slm_loss_fn = slm_loss_fn
        self.axis_name = axis_name

        self.to_mel = MelSpectrogram(
            n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
            hop_length=mc.hop_length, sample_rate=mc.sample_rate,
        )
        self.to_style_mel = MelSpectrogram(
            n_mels=mc.style_encoder.n_mels, n_fft=mc.style_encoder.n_fft,
            win_length=mc.style_encoder.win_length,
            hop_length=mc.style_encoder.hop_length, sample_rate=mc.sample_rate,
        )
        self.to_align_mel = MelSpectrogram(
            n_mels=mc.text_aligner.n_mels, n_fft=mc.text_aligner.n_fft,
            win_length=mc.text_aligner.win_length,
            hop_length=mc.hop_length * mc.coarse_multiplier,
            sample_rate=mc.sample_rate,
        )
        self.multi_spec = MultiSpectrogram(sample_rate=mc.sample_rate)
        self.duration_processor = DurationProcessor(
            mc.duration_predictor.duration_classes,
            mc.duration_predictor.max_duration,
        )
        self.blank_id = mc.text_encoder.tokens

    # ---- shared feature computation -------------------------------------

    def norm_mel(self, audio, transform):
        mel = transform(audio)
        mel = (jnp.log(1e-5 + mel) - self.norm.mel_log_mean) / self.norm.mel_log_std
        frames = mel.shape[-1] - (mel.shape[-1] % 2)
        return mel[:, :, :frames]

    def energy_from_mel(self, mel):
        """log L2-norm of the denormalized mel (reference utils.py:73-86)."""
        denorm = jnp.exp(mel * self.norm.mel_log_std + self.norm.mel_log_mean)
        return jnp.log(jnp.linalg.norm(denorm, axis=1) + 1e-9)

    def pmean(self, tree):
        if self.axis_name is None:
            return tree
        return jax.lax.pmean(tree, self.axis_name)


def _schedule_lr(ctx: StepContext, state: TrainState) -> jnp.ndarray:
    """Cosine LR from state.frozen["schedule"] when the trainer attached it
    (traced scalars -> the compiled program is reusable across stage
    lengths/LRs), else from the ctx constants (tests/benches)."""
    sched = state.frozen.get("schedule")
    if sched is None:
        return cosine_lr(ctx.base_lr, state.step, ctx.stage_steps)
    return cosine_lr(sched["base_lr"], state.step, sched["stage_steps"])


def _cast_f32(tree, dtype):
    """Cast float32 leaves to the compute dtype (master params stay fp32;
    gradients flow back through the cast in fp32)."""
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )


def _split_params(params: Dict[str, Any], train_names):
    train = {k: params[k] for k in train_names}
    frozen = {
        k: jax.lax.stop_gradient(v)
        for k, v in params.items()
        if k not in train_names
    }
    return train, frozen


def _apply_updates(ctx, state, grads, names, lr):
    """AdamW-update the named modules with a traced LR; grads pmean'd."""
    grads = ctx.pmean(grads)
    new_params = dict(state.params)
    new_opt = dict(state.opt_state)
    for name in names:
        new_params[name], new_opt[name] = apply_module_update(
            state.params[name], state.opt_state[name], grads[name], lr
        )
    return new_params, new_opt


def _masked_update(ctx, state, params, opt_state, grads, name, lr, apply_mask):
    """Update one module, keeping old values where apply_mask is False."""
    grads = ctx.pmean(grads)
    upd_p, upd_s = apply_module_update(
        state.params[name], state.opt_state[name], grads, lr
    )
    sel = lambda new, old: jnp.where(apply_mask, new, old)
    params[name] = jax.tree.map(sel, upd_p, state.params[name])
    opt_state[name] = jax.tree.map(sel, upd_s, state.opt_state[name])
    return params, opt_state


# ==========================================================================
# Alignment stage
# ==========================================================================


def make_alignment_step(ctx: StepContext, use_pallas: Optional[bool] = None):
    aligner = ctx.models["text_aligner"]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ..ops.ctc_pallas import ctc_loss_with_priors_pallas as ctc_loss
    else:
        ctc_loss = ctc_ops.ctc_loss_with_priors

    def step(state: TrainState, batch: Batch):
        rng, dropout_rng = jax.random.split(state.rng)
        mel = ctx.norm_mel(batch.audio_gt, ctx.to_align_mel)
        mel = jnp.moveaxis(mel, 1, 2)  # (B, F, 80)
        frames = mel.shape[1]
        mel_lengths = jnp.full((mel.shape[0],), frames, jnp.int32)

        def loss_fn(params):
            log_probs = aligner.apply(
                params, mel, mel_lengths, training=True,
                rngs={"dropout": dropout_rng},
            )
            loss = ctc_loss(
                log_probs, mel_lengths, batch.text, batch.text_lengths,
                blank_id=ctx.blank_id,
                log_priors=state.log_priors, prior_scale=0.3,
            )
            return loss * ctx.weights.get("align_loss", 1.0), log_probs

        (loss, log_probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["text_aligner"]
        )
        lr = _schedule_lr(ctx, state)
        params = dict(state.params)
        opt_state = dict(state.opt_state)
        g = ctx.pmean(grads)
        params["text_aligner"], opt_state["text_aligner"] = apply_module_update(
            state.params["text_aligner"], state.opt_state["text_aligner"], g, lr
        )

        # label-prior accumulation (logsumexp-merge, reference losses.py:538-560)
        lse, count = ctc_ops.accumulate_label_priors(
            jax.lax.stop_gradient(log_probs), mel_lengths
        )
        merged = jnp.logaddexp(state.log_priors_sum, lse)
        new_state = state.replace(
            params=params,
            opt_state=opt_state,
            log_priors_sum=merged,
            prior_count=state.prior_count + count,
            rng=rng,
            step=state.step + 1,
        )
        metrics = {"align_loss": loss, "lr": lr}
        return new_state, metrics

    return step


def finish_alignment_epoch(ctx: StepContext, state: TrainState) -> TrainState:
    """End-of-epoch label-prior update; cross-device reduction is a psum
    outside jit (reference losses.py:617-651 gathers via accelerate)."""
    new_priors = ctc_ops.update_log_priors(
        state.log_priors_sum, state.prior_count
    )
    n = state.log_priors_sum.shape[0]
    return state.replace(
        log_priors=new_priors,
        log_priors_sum=jnp.full((n,), -1e30, jnp.float32),
        prior_count=jnp.zeros((), jnp.float32),
    )


# ==========================================================================
# Acoustic / textual shared machinery
# ==========================================================================


def _acoustic_features(ctx, batch):
    mel = ctx.norm_mel(batch.audio_gt, ctx.to_mel)
    style_mel = ctx.norm_mel(batch.audio_gt, ctx.to_style_mel)
    energy = ctx.energy_from_mel(mel)
    frames = mel.shape[-1]
    pitch = batch.pitch[:, :frames]
    alignment = ctx.duration_processor.duration_to_alignment(
        batch.durations, frames
    )
    return mel, style_mel, energy, pitch, alignment, frames


def _adv_generator_metrics(ctx, frozen_disc_params, feats_t, feats_p,
                           audio_t, audio_p):
    """Generator-side adversarial loss over 3 MRDs + waveform disc
    (reference losses.py:313-327).  Discriminator activations run in
    ctx.disc_dtype (see StepContext)."""
    dt = ctx.disc_dtype
    frozen_disc_params = _cast_f32(frozen_disc_params, dt)
    total = 0.0
    for i in range(3):
        real = ctx.models[f"mrd{i}"].apply(
            frozen_disc_params[f"mrd{i}"], feats_t.fft_mag[i].astype(dt)
        )
        fake = ctx.models[f"mrd{i}"].apply(
            frozen_disc_params[f"mrd{i}"], feats_p.fft_mag[i].astype(dt)
        )
        total = total + L.generator_pair_loss(real, fake)
    real = ctx.models["disc"].apply(
        frozen_disc_params["disc"], audio_t.astype(dt)
    )
    fake = ctx.models["disc"].apply(
        frozen_disc_params["disc"], audio_p.astype(dt)
    )
    total = total + L.DISC_AUDIO_WEIGHT * L.generator_pair_loss(real, fake)
    return total


def _disc_phase_mrd(ctx, state, feats_t_fft, pred_fft_detached, audio_t,
                    audio_p_detached, disc_index, lr, sqrt_b):
    """Discriminator step on the detached generator outputs.

    The torch reference (stage.py:128-146) computes the disc loss over all
    THREE MRDs plus the waveform disc every step — DiscriminatorLoss.forward's
    acoustic branch loops ``for i in range(3)`` and ignores ``index``
    (losses.py:200-206) and each helper's last_loss EMA moves on call
    (losses.py:287) — but optimizer-steps only ``[mrd{index}, disc]``
    (stage.py:138-144). Two of the three MRD forward+backwards therefore buy
    nothing except EMA movement.

    ``ctx.sampled_mrd_only`` (default True) runs forward+backward for ONLY
    the sampled MRD via ``lax.switch`` — one compiled program, a third of
    the MRD disc-phase FLOPs — at the cost of each MRD's gap-aware-LR EMA
    advancing only on the steps its MRD is sampled (~1/3 cadence vs the
    reference). ``False`` reproduces the reference's all-3 compute + EMA
    trajectory exactly; the torch-parity harness uses it
    (tests/test_train_parity_trajectory.py). Either way param/opt updates
    touch only the sampled MRD + disc, matching the reference."""

    dt = ctx.disc_dtype
    disc_names = ["mrd0", "mrd1", "mrd2", "disc"]
    disc_params = {k: state.params[k] for k in disc_names}

    def make_loss_fn(active):
        """Disc loss over the MRD indices in `active` + the waveform disc."""

        def disc_loss_fn(p):
            cast = _cast_f32(p, dt)
            total = 0.0
            raws = {}
            for i in active:
                real = ctx.models[f"mrd{i}"].apply(
                    cast[f"mrd{i}"], feats_t_fft[i].astype(dt)
                )
                fake = ctx.models[f"mrd{i}"].apply(
                    cast[f"mrd{i}"], pred_fft_detached[i].astype(dt)
                )
                pair, raw = L.discriminator_pair_loss(real, fake)
                total = total + pair
                raws[f"mrd{i}"] = raw
            real = ctx.models["disc"].apply(cast["disc"], audio_t.astype(dt))
            fake = ctx.models["disc"].apply(
                cast["disc"], audio_p_detached.astype(dt)
            )
            pair, raw = L.discriminator_pair_loss(real, fake)
            total = total + L.DISC_AUDIO_WEIGHT * pair
            raws["disc"] = raw
            return total * sqrt_b, raws

        return disc_loss_fn

    if ctx.sampled_mrd_only:
        # The waveform disc runs every step regardless of which MRD was
        # sampled, so its forward+backward lives OUTSIDE the switch: the
        # first cut differentiated the combined loss inside every branch,
        # which duplicated the waveform-disc backward into all three and
        # tripled its footprint in the compiled program (42.9 MB MLIR,
        # ~18 min through the remote-compile tunnel, and large enough to
        # get the tunnel's compile helper OOM-killed). Each branch now
        # differentiates only its own MRD's loss w.r.t. that MRD's params.
        def wav_disc_loss(p):
            cast = _cast_f32(p, dt)
            real = ctx.models["disc"].apply(cast, audio_t.astype(dt))
            fake = ctx.models["disc"].apply(cast, audio_p_detached.astype(dt))
            pair, raw = L.discriminator_pair_loss(real, fake)
            return L.DISC_AUDIO_WEIGHT * pair * sqrt_b, raw

        (disc_term, raw_disc), disc_grad = jax.value_and_grad(
            wav_disc_loss, has_aux=True
        )(state.params["disc"])

        def make_branch(i):
            def mrd_loss(p):
                cast = _cast_f32(p, dt)
                real = ctx.models[f"mrd{i}"].apply(
                    cast, feats_t_fft[i].astype(dt)
                )
                fake = ctx.models[f"mrd{i}"].apply(
                    cast, pred_fft_detached[i].astype(dt)
                )
                pair, raw = L.discriminator_pair_loss(real, fake)
                return pair * sqrt_b, raw

            def branch(_):
                (mrd_term, raw), g = jax.value_and_grad(
                    mrd_loss, has_aux=True
                )(state.params[f"mrd{i}"])
                # Identical output structure across branches: real grads for
                # mrd_i, zeros for the other two (their updates are masked
                # off below anyway).
                g_all = {
                    f"mrd{j}": g if j == i else jax.tree.map(
                        jnp.zeros_like, state.params[f"mrd{j}"]
                    )
                    for j in range(3)
                }
                return mrd_term, raw, g_all

            return branch

        if ctx.forced_disc_index is not None:
            # statically resolved branch: identical math to the switch at
            # disc_index == forced_disc_index, but cond-free in the HLO so
            # cost analysis counts only executed work (bench.py MFU)
            mrd_term, raw_mrd, grads = make_branch(
                int(ctx.forced_disc_index)
            )(None)
        else:
            mrd_term, raw_mrd, grads = jax.lax.switch(
                disc_index, [make_branch(i) for i in range(3)], None
            )
        grads = dict(grads)
        grads["disc"] = disc_grad
        d_loss = disc_term + mrd_term
        raws = {"disc": raw_disc}
        ema_new = {
            f"mrd{i}": jnp.where(
                disc_index == i,
                update_disc_ema(state.disc_ema[f"mrd{i}"], raw_mrd),
                state.disc_ema[f"mrd{i}"],
            )
            for i in range(3)
        }
    else:
        (d_loss, raws), grads = jax.value_and_grad(
            make_loss_fn(range(3)), has_aux=True
        )(disc_params)
        ema_new = {
            f"mrd{i}": update_disc_ema(
                state.disc_ema[f"mrd{i}"], raws[f"mrd{i}"]
            )
            for i in range(3)
        }

    params = dict(state.params)
    opt_state = dict(state.opt_state)
    disc_ema = dict(state.disc_ema)
    disc_ema.update(ema_new)
    # gap-aware LR multipliers actually applied this step (from the
    # PRE-update EMAs) are surfaced as metrics: the long-horizon run's
    # occupancy analysis compares their distribution against the
    # 50k-step simulation envelope (scripts/simulate_ema_cadence.py)
    lr_mults = {}
    for i in range(3):
        name = f"mrd{i}"
        mult = L.disc_lr_multiplier(state.disc_ema[name], DISC_SUB_COUNT[name])
        lr_mults[f"{name}_lr_mult"] = mult
        params, opt_state = _masked_update(
            ctx, state, params, opt_state, grads[name], name, lr * mult,
            apply_mask=(disc_index == i),
        )
    mult = L.disc_lr_multiplier(state.disc_ema["disc"], DISC_SUB_COUNT["disc"])
    lr_mults["disc_lr_mult"] = mult
    g = ctx.pmean(grads["disc"])
    params["disc"], opt_state["disc"] = apply_module_update(
        state.params["disc"], state.opt_state["disc"], g, lr * mult
    )
    disc_ema["disc"] = update_disc_ema(state.disc_ema["disc"], raws["disc"])
    return params, opt_state, disc_ema, d_loss / sqrt_b, lr_mults


def make_acoustic_step(ctx: StepContext):
    train_names = ("speech_predictor", "speech_style_encoder")

    def step(state: TrainState, batch: Batch):
        rng, r_drop, r_model, r_idx = jax.random.split(state.rng, 4)
        mel, style_mel, energy, pitch, alignment, frames = _acoustic_features(
            ctx, batch
        )
        audio_t = batch.audio_gt[:, : frames * ctx.mc.hop_length]
        if ctx.forced_disc_index is not None:
            disc_index = jnp.int32(ctx.forced_disc_index)
        else:
            disc_index = jax.random.randint(r_idx, (), 0, 3)
        sqrt_b = math.sqrt(batch.text.shape[0])
        feats_t = jax.tree.map(
            jax.lax.stop_gradient, ctx.multi_spec(audio_t)
        )

        dt = ctx.compute_dtype

        def gen_loss_fn(train_params):
            cast_params = _cast_f32(train_params, dt)
            style = ctx.models["speech_style_encoder"].apply(
                cast_params["speech_style_encoder"],
                style_mel.astype(dt),
            )
            voiced = (pitch > 20.0).astype(dt)
            # parity mode disables the per-step stochastic regularizers
            # (dropout, decoder F0/N smoothing, sine-source phase/noise):
            # they draw from framework-specific RNG streams and can never
            # agree with the torch reference draw-for-draw. The torch side
            # of the harness runs in eval mode for the same reason.
            pred = ctx.models["speech_predictor"].apply(
                cast_params["speech_predictor"],
                batch.text, batch.text_lengths, alignment.astype(dt),
                pitch.astype(dt), energy.astype(dt), voiced, style,
                pitch.astype(dt),
                rng=r_model, training=not ctx.parity_deterministic,
                deterministic_prior=ctx.parity_deterministic,
                prior=ctx.parity_prior,
                rngs={"dropout": r_drop},
            )
            feats_p = ctx.multi_spec(pred.audio)
            metrics = {
                "mel": L.spectral_convergence_loss(feats_t.mel, feats_p.mel),
                "multi_phase": L.multi_phase_loss(feats_p.phase, feats_t.phase),
                "generator": _adv_generator_metrics(
                    ctx,
                    {k: jax.lax.stop_gradient(state.params[k])
                     for k in ("mrd0", "mrd1", "mrd2", "disc")},
                    feats_t, feats_p, audio_t, pred.audio,
                ),
            }
            if pred.magnitude is not None:
                # ringformer emits its head's log-mag/phase: MagPhase loss
                # vs the GT STFT at the head resolution (reference
                # losses.py:94-163, built for this generator family)
                from ..dsp import stft as stft_lib

                gmc = ctx.mc.generator
                t_real, t_imag = stft_lib.stft(
                    audio_t, gmc.gen_istft_n_fft, gmc.gen_istft_hop_size,
                    gmc.gen_istft_n_fft,
                )
                frames_mp = min(pred.magnitude.shape[-1], t_real.shape[-1])
                metrics.update(
                    L.magphase_loss(
                        pred.magnitude[:, :, :frames_mp],
                        pred.phase[:, :, :frames_mp],
                        t_real[:, :, :frames_mp],
                        t_imag[:, :, :frames_mp],
                    )
                )
            if ctx.slm_loss_fn is not None:
                if batch.slm_gt is not None:
                    # GT side precomputed (dataprep/slm_cache): only the
                    # predicted audio pays the WavLM forward
                    from ..models.slm import wavlm_loss_cached

                    metrics["slm"] = wavlm_loss_cached(
                        state.frozen["wavlm"], batch.slm_gt, pred.audio
                    )
                else:
                    metrics["slm"] = ctx.slm_loss_fn(
                        state.frozen["wavlm"], audio_t, pred.audio
                    )
            total = L.backwards_loss(metrics, ctx.weights)
            return total, (metrics, pred.audio, feats_p.fft_mag)

        train_params, _ = _split_params(state.params, train_names)
        (_, (metrics, pred_audio, pred_fft)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(train_params)

        lr = _schedule_lr(ctx, state)
        params, opt_state = _apply_updates(ctx, state, grads, train_names, lr)

        # --- discriminator phase on detached outputs ---
        mid_state = state.replace(params=params, opt_state=opt_state)
        pred_audio_d = jax.lax.stop_gradient(pred_audio)
        pred_fft_d = [jax.lax.stop_gradient(f) for f in pred_fft]
        params, opt_state, disc_ema, d_loss, lr_mults = _disc_phase_mrd(
            ctx, mid_state, feats_t.fft_mag, pred_fft_d, audio_t,
            pred_audio_d, disc_index, lr, sqrt_b,
        )

        new_state = state.replace(
            params=params, opt_state=opt_state, disc_ema=disc_ema,
            rng=rng, step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["discriminator"] = d_loss
        metrics["lr"] = lr
        metrics.update(lr_mults)
        return new_state, metrics

    return step


def make_textual_step(ctx: StepContext):
    train_names = ("pitch_energy_predictor", "pe_style_encoder")

    def step(state: TrainState, batch: Batch):
        rng, r_drop, r_model = jax.random.split(state.rng, 3)
        mel, style_mel, energy, pitch, alignment, frames = _acoustic_features(
            ctx, batch
        )
        audio_t = batch.audio_gt[:, : frames * ctx.mc.hop_length]
        voiced = (pitch > 10.0).astype(jnp.float32)
        sqrt_b = math.sqrt(batch.text.shape[0])
        feats_t = jax.tree.map(jax.lax.stop_gradient, ctx.multi_spec(audio_t))
        dt = ctx.compute_dtype
        frozen = _cast_f32(
            {
                k: jax.lax.stop_gradient(state.params[k])
                for k in ("speech_predictor", "speech_style_encoder",
                          "pitch_disc")
            },
            dt,
        )

        def gen_loss_fn(train_params):
            cast_params = _cast_f32(train_params, dt)
            pe_style = ctx.models["pe_style_encoder"].apply(
                cast_params["pe_style_encoder"],
                style_mel.astype(dt), pitch.astype(dt), energy.astype(dt),
            )
            pred_pitch, pred_energy = ctx.models["pitch_energy_predictor"].apply(
                cast_params["pitch_energy_predictor"],
                batch.text, batch.text_lengths, alignment.astype(dt), pe_style,
                training=True, rngs={"dropout": r_drop},
            )
            pred_pitch = pred_pitch.astype(jnp.float32)
            pred_energy = pred_energy.astype(jnp.float32)
            # run the frozen acoustic path on predicted prosody
            speech_style = ctx.models["speech_style_encoder"].apply(
                frozen["speech_style_encoder"], style_mel.astype(dt),
            )
            pred_voiced = (pred_pitch > 20.0).astype(dt)
            pred = ctx.models["speech_predictor"].apply(
                frozen["speech_predictor"],
                batch.text, batch.text_lengths, alignment.astype(dt),
                pred_pitch.astype(dt), pred_energy.astype(dt), pred_voiced,
                speech_style, pred_pitch.astype(dt),
                rng=r_model, training=False,
            )
            feats_p = ctx.multi_spec(pred.audio)

            pitchcat = jnp.stack([pitch * voiced, energy], axis=1)
            pred_pitchcat = jnp.stack(
                [pred_pitch * voiced, pred_energy], axis=1
            )
            real = ctx.models["pitch_disc"].apply(
                frozen["pitch_disc"], pitchcat
            )
            fake = ctx.models["pitch_disc"].apply(
                frozen["pitch_disc"], pred_pitchcat
            )
            metrics = {
                "mel": L.spectral_convergence_loss(feats_t.mel, feats_p.mel),
                "generator": L.generator_pair_loss(real, fake),
            }
            metrics.update(
                L.pitch_energy_losses(pred_pitch, pitch, pred_energy, energy)
            )
            total = L.backwards_loss(metrics, ctx.weights)
            return total, (metrics, pitchcat, pred_pitchcat)

        train_params, _ = _split_params(state.params, train_names)
        (_, (metrics, pitchcat, pred_pitchcat)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(train_params)
        lr = _schedule_lr(ctx, state)
        params, opt_state = _apply_updates(ctx, state, grads, train_names, lr)

        # --- pitch discriminator phase ---
        def disc_loss_fn(disc_params):
            real = ctx.models["pitch_disc"].apply(disc_params, pitchcat)
            fake = ctx.models["pitch_disc"].apply(
                disc_params, jax.lax.stop_gradient(pred_pitchcat)
            )
            pair, raw = L.discriminator_pair_loss(real, fake)
            return pair * sqrt_b, raw

        (d_loss, raw), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.params["pitch_disc"])
        mult = L.disc_lr_multiplier(
            state.disc_ema["pitch_disc"], DISC_SUB_COUNT["pitch_disc"]
        )
        g = ctx.pmean(dgrads)
        params["pitch_disc"], opt_state["pitch_disc"] = apply_module_update(
            state.params["pitch_disc"], state.opt_state["pitch_disc"], g,
            lr * mult,
        )
        disc_ema = dict(state.disc_ema)
        disc_ema["pitch_disc"] = update_disc_ema(
            state.disc_ema["pitch_disc"], raw
        )

        new_state = state.replace(
            params=params, opt_state=opt_state, disc_ema=disc_ema,
            rng=rng, step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["discriminator"] = d_loss / sqrt_b
        metrics["lr"] = lr
        return new_state, metrics

    return step


def make_duration_step(ctx: StepContext, duration_class_weights):
    train_names = ("duration_predictor", "duration_style_encoder")

    def step(state: TrainState, batch: Batch):
        rng, r_drop = jax.random.split(state.rng)
        style_mel = ctx.norm_mel(batch.audio_gt, ctx.to_style_mel)
        target_dur = batch.durations.astype(jnp.float32)
        targets = ctx.duration_processor.dur_to_class(batch.durations)
        sqrt_b = math.sqrt(batch.text.shape[0])
        frozen_dd = jax.lax.stop_gradient(state.params["dur_disc"])
        # Generator phase honors ctx.compute_dtype like the other stages
        # (master params fp32, activations in dt); losses + both disc
        # phases stay fp32, matching the textual stage's split.
        dt = ctx.compute_dtype

        def gen_loss_fn(train_params):
            cast_params = _cast_f32(train_params, dt)
            dstyle = ctx.models["duration_style_encoder"].apply(
                cast_params["duration_style_encoder"], style_mel.astype(dt),
            )
            duration_raw = ctx.models["duration_predictor"].apply(
                cast_params["duration_predictor"],
                batch.text, batch.text_lengths, dstyle,
                training=True, rngs={"dropout": r_drop},
            )
            duration_raw = duration_raw.astype(jnp.float32)
            duration = ctx.duration_processor.prediction_to_duration(
                duration_raw, batch.text_lengths
            )
            dur_l1 = L.masked_smooth_l1_per_sequence(
                duration, target_dur, batch.text_lengths
            )
            ce = L.duration_ce_loss(
                duration_raw, targets, batch.text_lengths,
                duration_class_weights,
            )
            real = ctx.models["dur_disc"].apply(
                frozen_dd, target_dur[:, None, :]
            )
            fake = ctx.models["dur_disc"].apply(
                frozen_dd, duration[:, None, :]
            )
            metrics = {
                "duration": dur_l1,
                "duration_ce": ce,
                "generator": L.generator_pair_loss(real, fake),
            }
            total = L.backwards_loss(metrics, ctx.weights)
            return total, (metrics, duration)

        train_params, _ = _split_params(state.params, train_names)
        (_, (metrics, duration)), grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(train_params)
        lr = _schedule_lr(ctx, state)
        params, opt_state = _apply_updates(ctx, state, grads, train_names, lr)

        def disc_loss_fn(disc_params):
            real = ctx.models["dur_disc"].apply(
                disc_params, target_dur[:, None, :]
            )
            fake = ctx.models["dur_disc"].apply(
                disc_params, jax.lax.stop_gradient(duration)[:, None, :]
            )
            pair, raw = L.discriminator_pair_loss(real, fake)
            return pair * sqrt_b, raw

        (d_loss, raw), dgrads = jax.value_and_grad(
            disc_loss_fn, has_aux=True
        )(state.params["dur_disc"])
        mult = L.disc_lr_multiplier(
            state.disc_ema["dur_disc"], DISC_SUB_COUNT["dur_disc"]
        )
        g = ctx.pmean(dgrads)
        params["dur_disc"], opt_state["dur_disc"] = apply_module_update(
            state.params["dur_disc"], state.opt_state["dur_disc"], g, lr * mult
        )
        disc_ema = dict(state.disc_ema)
        disc_ema["dur_disc"] = update_disc_ema(state.disc_ema["dur_disc"], raw)

        new_state = state.replace(
            params=params, opt_state=opt_state, disc_ema=disc_ema,
            rng=rng, step=state.step + 1,
        )
        metrics = dict(metrics)
        metrics["discriminator"] = d_loss / sqrt_b
        metrics["lr"] = lr
        return new_state, metrics

    return step


STEP_BUILDERS = {
    "alignment": make_alignment_step,
    "acoustic": make_acoustic_step,
    "textual": make_textual_step,
}

STAGE_SEQUENCE = {
    "alignment": None,
    "acoustic": "textual",
    "textual": "duration",
    "duration": None,
}

STAGE_TRAIN_MODELS = {
    "alignment": ["text_aligner"],
    "acoustic": ["speech_predictor", "speech_style_encoder"],
    "textual": ["pitch_energy_predictor", "pe_style_encoder"],
    "duration": ["duration_predictor", "duration_style_encoder"],
}

STAGE_DISCRIMINATORS = {
    "alignment": [],
    "acoustic": ["mrd0", "mrd1", "mrd2", "disc"],
    "textual": ["pitch_disc"],
    "duration": ["dur_disc"],
}
