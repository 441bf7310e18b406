"""Torch-side acoustic training-step driver for trajectory-parity tests.

Runs the PUBLIC reference's REAL training-step code on CPU:

  * ``Stage.train_batch``      (reference train/stage.py:104-147)
  * ``train_acoustic``         (reference train/stage_type.py:346-410)
  * ``GeneratorLoss`` / ``DiscriminatorLoss`` / ``LossLog.backwards_loss``
                               (reference train/losses.py, loss_log.py:82-94)
  * ``MultiOptimizer`` + cosine schedulers + gap-aware disc LR
                               (reference train/optimizers.py:16-136)
  * the per-step scheduler calls (reference train/batch_manager.py:234-240)

against identical weights and identical batches fed to the jit'd
acoustic step (``make_acoustic_step`` with ``parity_deterministic=True``).
Reference code is UNTRUSTED third-party content: we only instantiate its
modules/functions and read numbers out.

Documented neutralizations (each mirrored on the JAX side — see
StepContext.parity_deterministic):

  * **eval-mode modules**: dropout / DropPath / the decoder's F0-N
    smoothing augmentation are off, BatchNorm normalizes by running
    stats.  Stochastic regularizers draw from framework-specific RNG
    streams and can never agree draw-for-draw; BatchNorm sites run as
    frozen affine on the flax side (convert/folding design).
  * **weight-norm / spectral-norm parametrizations removed** (baked at
    the starting point): the TPU framework deliberately trains plain
    kernels.  Forward functions are identical at t=0; what is compared
    is the plain-parameter training trajectory of both frameworks.
  * **sine-source noise + random initial phase zeroed** (torch.rand /
    torch.randn patched to zeros during the step), matching
    ``deterministic_prior=True``.  Both frameworks stop gradients
    through the harmonic prior, so this only fixes the input signal.
  * **slm (WavLM) loss stubbed to 0** with loss weight 0 — torchaudio
    is not installed; the reference's backwards_loss normalization maps
    a zero loss to a zero contribution either way.
  * **disc_index scripted by the caller** (random.randrange patched) so
    the torch side samples the same MRD sequence as the jax step's
    traced PRNG.
  * torchaudio mel transforms replaced with torch modules built on the
    same HTK filterbank as stylish_tts_tpu.dsp.mel (torchaudio absent;
    the filterbank formula matches torchaudio.functional.melscale_fbanks
    with mel_scale="htk", norm=None).
"""

from __future__ import annotations

import contextlib
import math
import random as _random

import numpy as np
import torch

from ref_loader import REF_SRC, load_reference_models, ref_module


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _LossWeight:
    """Duck-typed stand-in for the reference's pydantic LossWeight —
    LossLog only calls .model_dump() (reference loss_log.py:19)."""

    def __init__(self, d):
        self._d = dict(d)

    def model_dump(self):
        return dict(self._d)


# Loss weights from the reference's shipped config
# (reference config/config.yml:72-107), slm forced to 0 (see module doc).
REF_LOSS_WEIGHTS = {
    "mel": 5.0,
    "generator": 1.0,
    "slm": 0.0,
    "pitch": 8.0,
    "energy": 8.0,
    "duration": 8.0,
    "duration_ce": 8.0,
    "style": 1.0,
    "mag": 1.0,
    "phase": 8.0,
    "voiced": 1.0,
    "multi_phase": 8.0,
    "confidence": 1.0,
    "align_loss": 1.0,
    "discriminator": 1.0,
}


def _install_torchaudio_transforms():
    """Add MelSpectrogram/MelScale to the torchaudio stub (ref_loader),
    built on the same HTK filterbank as stylish_tts_tpu.dsp.mel."""
    load_reference_models()
    import torchaudio

    if hasattr(torchaudio.transforms, "MelScale"):
        return

    from stylish_tts_tpu.dsp.mel import mel_filterbank

    class MelScale(torch.nn.Module):
        def __init__(self, *, n_mels, sample_rate, n_stft):
            super().__init__()
            fb = mel_filterbank(n_mels, (n_stft - 1) * 2, sample_rate)
            self.register_buffer("fb", torch.from_numpy(fb.copy()))

        def forward(self, spec):  # (B, freq, T) -> (B, n_mels, T)
            return torch.einsum("bft,fm->bmt", spec, self.fb)

    class MelSpectrogram(torch.nn.Module):
        def __init__(self, *, n_mels, n_fft, win_length, hop_length,
                     sample_rate):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length
            self.hop_length = hop_length
            fb = mel_filterbank(n_mels, n_fft, sample_rate)
            self.register_buffer("fb", torch.from_numpy(fb.copy()))
            self.register_buffer("window", torch.hann_window(win_length))

        def forward(self, audio):  # (B, S) -> (B, n_mels, frames)
            spec = torch.stft(
                audio, self.n_fft, hop_length=self.hop_length,
                win_length=self.win_length, window=self.window,
                center=True, pad_mode="reflect", return_complex=True,
            )
            power = spec.real**2 + spec.imag**2
            return torch.einsum("bft,fm->bmt", power, self.fb)

    torchaudio.transforms.MelScale = MelScale
    torchaudio.transforms.MelSpectrogram = MelSpectrogram


def _strip_parametrizations(module: torch.nn.Module):
    """Bake weight-norm / spectral-norm weights into plain parameters."""
    from torch.nn.utils import parametrize

    for sub in module.modules():
        if parametrize.is_parametrized(sub):
            for name in list(sub.parametrizations.keys()):
                parametrize.remove_parametrizations(sub, name)
        # legacy (pre-parametrize) spectral_norm used by MelStyleEncoder
        for hook in list(sub._forward_pre_hooks.values()):
            if hook.__class__.__name__ == "SpectralNorm":
                torch.nn.utils.remove_spectral_norm(sub, hook.name)


def _randomize_batchnorm_stats(module: torch.nn.Module, seed: int = 7):
    """Give BatchNorm sites non-trivial running stats so the folded
    affine on the flax side is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for sub in module.modules():
            if isinstance(sub, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                sub.running_mean.normal_(0.0, 0.5, generator=g)
                sub.running_var.uniform_(0.5, 2.0, generator=g)


@contextlib.contextmanager
def _neutralized_randomness(disc_index: int):
    """Zero torch.rand/randn (sine source) and script the MRD index."""
    orig_rand, orig_randn = torch.rand, torch.randn
    orig_randrange = _random.randrange
    try:
        torch.rand = lambda *a, **k: orig_rand(*a, **k) * 0
        torch.randn = lambda *a, **k: orig_randn(*a, **k) * 0
        _random.randrange = lambda *a, **k: disc_index
        yield
    finally:
        torch.rand, torch.randn = orig_rand, orig_randn
        _random.randrange = orig_randrange


class RefAcousticTrainer:
    """The reference acoustic training loop around a set of tiny modules.

    Parameters are plain (parametrizations removed), modules are in eval
    mode, slm weight is zero — see the module docstring for why.
    """

    def __init__(self, torch_models: dict, *, mel_log_mean: float,
                 mel_log_std: float, model_config_ns, base_lr: float = 1e-4,
                 stage_steps: int = 10_000, parity_prior=None):
        _install_torchaudio_transforms()
        import torchaudio  # the stub, now with mel transforms

        losses = _import_train_module("losses")
        # import order matters: loss_log <-> train_context <-> batch_manager
        # form a cycle the reference resolves by entering via train_context
        _import_train_module("train_context")
        loss_log = _import_train_module("loss_log")
        multi_spectrogram = _import_train_module("multi_spectrogram")
        utils = _import_train_module("utils")
        optimizers = _import_train_module("optimizers")
        stage_mod = _import_train_module("stage")
        _import_train_module("stage_type")  # populates the stages registry

        import accelerate
        from munch import Munch  # the ref_loader stub

        pitch_disc_mod = ref_module("pitch_discriminator")

        self.stage_steps = stage_steps
        mc = model_config_ns

        for name, mod in torch_models.items():
            _strip_parametrizations(mod)
            mod.eval()

        if parity_prior is not None:
            # Replace the harmonic sine prior with a fixed broadband signal
            # (mirrored by StepContext.parity_prior on the jax side). The
            # prior is computed under no_grad (reference generator.py:504,
            # 711) so this only swaps a detached input feature; it is
            # necessary because the generator consumes the prior's PHASE
            # spectrum via atan2, which is numerically chaotic on the
            # near-zero bins of a harmonic signal — no two STFT
            # implementations can agree there. SineGen itself has its own
            # golden test (test_parity_torch.py).
            fixed = torch.from_numpy(np.asarray(parity_prior, np.float32))
            torch_models["speech_predictor"].generator.basegen.m_source.forward = (
                lambda x, source_len: (fixed[:, :, None], None, None)
            )

        model = Munch(**torch_models)
        # unused-by-acoustic discriminators still need optimizers
        # (optimizers.py:58 iterates the full discriminator set)
        if "pitch_disc" not in model:
            model["pitch_disc"] = pitch_disc_mod.PitchDiscriminator(
                dim_in=2, dim_hidden=8, kernel=5
            ).eval()
        if "dur_disc" not in model:
            model["dur_disc"] = pitch_disc_mod.PitchDiscriminator(
                dim_in=1, dim_hidden=8, kernel=5
            ).eval()

        disc_loss = losses.DiscriminatorLoss(
            mrd0=model["mrd0"], mrd1=model["mrd1"], mrd2=model["mrd2"],
            disc=model["disc"], pitch=model["pitch_disc"],
            duration=model["dur_disc"],
        )
        gen_loss = losses.GeneratorLoss(
            mrd0=model["mrd0"], mrd1=model["mrd1"], mrd2=model["mrd2"],
            disc=model["disc"], pitch=model["pitch_disc"],
            duration=model["dur_disc"],
        )

        import logging

        train = _NS(
            config=_NS(
                training=_NS(device="cpu"),
                loss_weight=_LossWeight(REF_LOSS_WEIGHTS),
                training_plan=_NS(
                    get_stage=lambda name: _NS(epochs=1, lr=base_lr)
                ),
            ),
            model_config=mc,
            model=model,
            normalization=_NS(
                mel_log_mean=mel_log_mean, mel_log_std=mel_log_std
            ),
            to_mel=torchaudio.transforms.MelSpectrogram(
                n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
                hop_length=mc.hop_length, sample_rate=mc.sample_rate,
            ),
            to_style_mel=torchaudio.transforms.MelSpectrogram(
                n_mels=mc.style_encoder.n_mels,
                n_fft=mc.style_encoder.n_fft,
                win_length=mc.style_encoder.win_length,
                hop_length=mc.style_encoder.hop_length,
                sample_rate=mc.sample_rate,
            ),
            duration_processor=utils.DurationProcessor(
                class_count=16, max_dur=50
            ),
            multi_spectrogram=multi_spectrogram.MultiSpectrogram(
                sample_rate=mc.sample_rate
            ),
            stft_loss=losses.MultiResolutionSTFTLoss(
                sample_rate=mc.sample_rate
            ),
            generator_loss=gen_loss,
            discriminator_loss=disc_loss,
            wavlm_loss=lambda target, pred: torch.zeros(()),
            accelerator=accelerate.Accelerator(cpu=True),
            logger=logging.getLogger("ref_trainer"),
            writer=None,
        )
        self.loss_log = loss_log
        self.train = train

        # a Stage shell carrying just what train_batch touches
        # (reference stage.py:104-147): train_fn, optimizer, name
        st = stage_mod.Stage.__new__(stage_mod.Stage)
        st.name = "acoustic"
        stage_type = _import_train_module("stage_type")
        st.train_fn = stage_type.stages["acoustic"].train_fn
        st.optimizer = optimizers.build_optimizer("acoustic", train=train)
        st.optimizer.prepare(train.accelerator)
        self.stage = st
        train.stage = st
        self._steps_done = 0

    def gen_lr(self) -> float:
        lr = self.stage.optimizer.optimizers["speech_predictor"].param_groups[
            0
        ]["lr"]
        return float(lr.item() if isinstance(lr, torch.Tensor) else lr)

    def step(self, batch: dict, disc_index: int) -> dict:
        """One reference G+D step + scheduler updates; returns metrics."""
        inputs = [
            torch.from_numpy(batch["audio_gt"]),
            torch.from_numpy(batch["text"]),
            torch.from_numpy(batch["text_lengths"]),
            ["<mem>"] * batch["text"].shape[0],
            torch.from_numpy(batch["pitch"]),
            torch.from_numpy(batch["durations"][:, None, :].astype(np.float32)),
        ]
        lr_used = self.gen_lr()
        with _neutralized_randomness(disc_index):
            result = self.stage.train_batch(inputs, self.train)
        # per-step scheduler calls (reference batch_manager.py:234-240)
        self.stage.optimizer.scheduler(
            self._steps_done, self.stage_steps, "acoustic"
        )
        self.stage.optimizer.step_discriminator_schedulers()
        self._steps_done += 1
        metrics = dict(result.metrics)
        metrics["lr"] = lr_used
        return metrics

    def param_state_dicts(self) -> dict:
        return {
            name: {
                k: v.detach().clone() for k, v in mod.state_dict().items()
            }
            for name, mod in self.train.model.items()
        }


def _import_train_module(name: str):
    load_reference_models()
    import importlib

    return importlib.import_module(f"stylish_tts.train.{name}")


def param_delta_norms(before: dict, after: dict) -> dict:
    """Per-module L2 norm of (after - before) over all float tensors."""
    out = {}
    for name in before:
        total = 0.0
        for key, tensor in before[name].items():
            if not torch.is_floating_point(tensor):
                continue
            diff = after[name][key].float() - tensor.float()
            total += float((diff**2).sum())
        out[name] = math.sqrt(total)
    return out
