"""Mel spectrograms (HTK scale, torchaudio-compatible).

Parity target: ``torchaudio.transforms.MelSpectrogram`` with its
defaults (power=2.0, mel_scale="htk", norm=None, center=True,
pad_mode="reflect", hann window), which is what the reference trainer
builds for its main/style/align mel transforms
(reference: src/stylish_tts/train/train_context.py:155-178).

The mel projection is a (freq_bins x n_mels) matmul fused by XLA with
the DFT matmul of the framed STFT — the whole audio->log-mel pipeline
is two MXU matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import stft


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    n_mels: int,
    n_fft: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK-mel filterbank, shape (freq_bins, n_mels).

    Matches torchaudio.functional.melscale_fbanks(mel_scale="htk", norm=None).
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    freq_bins = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, freq_bins)
    mel_pts = np.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = _mel_to_hz(mel_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (freq, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


class MelSpectrogram:
    """Callable audio (B, T) -> mel power spectrogram (B, n_mels, frames)."""

    def __init__(
        self,
        *,
        n_mels: int,
        n_fft: int,
        win_length: int,
        hop_length: int,
        sample_rate: int,
        power: float = 2.0,
    ):
        self.n_mels = n_mels
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.sample_rate = sample_rate
        self.power = power
        self._fb = mel_filterbank(n_mels, n_fft, sample_rate)

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        real, imag = stft(
            audio, self.n_fft, self.hop_length, self.win_length, center=True
        )
        power_spec = real * real + imag * imag
        if self.power != 2.0:
            power_spec = jnp.power(jnp.maximum(power_spec, 1e-30), self.power / 2.0)
        fb = jnp.asarray(self._fb)  # (freq, mel)
        # (B, freq, frames) x (freq, mel) -> (B, mel, frames)
        return jnp.einsum(
            "bft,fm->bmt",
            power_spec,
            fb,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def log_mel(mel: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    return jnp.log(eps + mel)


def calculate_mel(audio, to_mel: MelSpectrogram, mean: float, std: float):
    """Normalized log-mel, trimmed to an even frame count.

    Behavioral parity with the reference's calculate_mel
    (reference: src/stylish_tts/train/utils.py:826-835): STFT yields
    audio_len // hop + 1 frames; the trailing odd frame is stripped.
    Returns (mel, frame_count).
    """
    mel = to_mel(audio)
    mel = (jnp.log(1e-5 + mel) - mean) / std
    frames = mel.shape[-1] - (mel.shape[-1] % 2)
    return mel[:, :, :frames], frames
