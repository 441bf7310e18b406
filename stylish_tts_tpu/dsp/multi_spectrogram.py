"""Multi-resolution spectrogram features for losses and MRD discriminators.

Capability parity with the reference MultiSpectrogram
(reference: src/stylish_tts/train/multi_spectrogram.py:13-81): three
STFT resolutions; per resolution it produces
  * log1p 128-bin mel magnitude (for the multi-res "mel" loss),
  * phase, thresholded where magnitude <= 1e-3 (for the phase loss),
  * raw |FFT| magnitude (input to the MRD discriminators).

Target features are wrapped in stop_gradient by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from .mel import mel_filterbank
from .stft import stft


@dataclass(frozen=True)
class Resolution:
    fft: int
    hop: int
    window: int


RESOLUTIONS = (
    Resolution(fft=512, hop=128, window=512),
    Resolution(fft=1024, hop=256, window=1024),
    Resolution(fft=2048, hop=512, window=2048),
)


class SpectrogramFeatures(NamedTuple):
    mel: List[jnp.ndarray]  # each (B, 1, 128, frames)
    phase: List[jnp.ndarray]  # each (B, freq, frames)
    fft_mag: List[jnp.ndarray]  # each (B, 1, freq, frames)


class MultiSpectrogram:
    def __init__(self, *, sample_rate: int, resolutions=RESOLUTIONS):
        self.resolutions = resolutions
        self._fbs = [
            mel_filterbank(128, item.fft, sample_rate) for item in resolutions
        ]

    def single(self, audio: jnp.ndarray, index: int) -> tuple:
        item = self.resolutions[index]
        real, imag = stft(audio, item.fft, item.hop, item.window, center=True)
        fft_mag = jnp.sqrt(real * real + imag * imag + 1e-14)
        # Phase only where there is signal energy; the mask is data, not a
        # gradient path (magnitudes enter the loss through fft_mag).
        mask = (fft_mag > 1e-3).astype(jnp.float32)
        phase = mask * jnp.arctan2(imag, real)
        fb = jnp.asarray(self._fbs[index])
        mel = jnp.log1p(
            jnp.einsum("bft,fm->bmt", fft_mag, fb, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        )
        return mel[:, None, :, :], phase, fft_mag[:, None, :, :]

    def __call__(self, audio: jnp.ndarray) -> SpectrogramFeatures:
        mels, phases, ffts = [], [], []
        for i in range(len(self.resolutions)):
            mel, phase, fft_mag = self.single(audio, i)
            mels.append(mel)
            phases.append(phase)
            ffts.append(fft_mag)
        return SpectrogramFeatures(mel=mels, phase=phases, fft_mag=ffts)
