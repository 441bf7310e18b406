"""Ringformer-style vocoder: conformer-interleaved upsampling + iSTFT.

The reference retains this alternate generator behind
``generator.type: ringformer`` (reference: train/models/generator.py:66-259
UpsampleGenerator + generate_pcph generator.py:904-973; config schema
config_loader.py:213; model.yml keeps the block commented out).  Same
availability here: snake + per-scale Conformer + transposed-conv
upsampling, pcph harmonic prior injected at every scale through strided
noise convs, HiFi-GAN-style multi-kernel AdaptiveGeneratorBlocks, and a
small-n_fft iSTFT head.

TPU notes: transposed conv upsampling is expressed as the same
dense-expand + pixel-shuffle used by the freegan path (MXU matmul);
the pcph phase integrates at frame rate exactly (the radians are
constant within a frame, so the audio-rate cumsum equals frame cumsum
+ an in-frame ramp).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..dsp import stft as stft_lib
from .common import AdaptiveGeneratorBlock, Conv1d, snake
from .conformer import Conformer
from .generator import DecoderPrediction

MAX_HARMONICS = 16


def generate_pcph(
    f0: jnp.ndarray,  # (B, frames) Hz
    voiced: jnp.ndarray,  # (B, frames) 0/1
    hop_length: int,
    sample_rate: int,
    rng: jax.Array,
    power_factor: float = 0.1,
) -> jnp.ndarray:
    """Pseudo-constant-power harmonic prior (reference generator.py:904-973).

    Returns (B, frames*hop_length) waveform of masked harmonics with a
    flat spectral envelope and per-run random initial phase.
    """
    b, frames = f0.shape
    vuv = jnp.round(voiced)
    idx = jnp.arange(1, MAX_HARMONICS + 1, dtype=jnp.float32)[None, :, None]
    harmonic_f0 = f0[:, None, :] * idx  # (B, H, frames)
    harmonic_mask = (harmonic_f0 <= sample_rate / 2.0).astype(jnp.float32)
    n_harm = jnp.maximum(
        vuv[:, None, :] * jnp.sum(harmonic_mask, axis=1, keepdims=True), 1.0
    )
    amplitude = vuv[:, None, :] * power_factor * jnp.sqrt(2.0 / n_harm)

    # phase: radians/sample constant within a frame -> frame cumsum + ramp
    rad = f0.astype(jnp.float32) / sample_rate  # (B, frames)
    # rng=None -> zero initial phase (deterministic parity tests / export)
    rand_ini = (
        jnp.zeros((1, 1)) if rng is None else jax.random.uniform(rng, (1, 1))
    )
    cum_start = (
        jnp.cumsum(rad, axis=1) - rad + rand_ini
    )  # phase (in cycles) at each frame start / hop
    # ramp starts at 1: the reference cumsum is sample-INCLUSIVE
    # (generator.py:960: radious = cumsum includes the current sample)
    ramp = jnp.arange(1, hop_length + 1, dtype=jnp.float32)[None, None, :]
    cycles = cum_start[:, :, None] * hop_length + rad[:, :, None] * ramp
    cycles = cycles.reshape(b, 1, frames * hop_length)  # (B, 1, T)
    phase = 2.0 * jnp.pi * cycles * idx  # (B, H, T)
    harmonics = jnp.sin(phase)

    def upsample(x):  # (B, H, frames) -> (B, H, T) via repeat
        return jnp.repeat(x, hop_length, axis=2)

    harmonics = harmonics * upsample(harmonic_mask)
    return jnp.sum(harmonics, axis=1) * upsample(amplitude)[:, 0]  # (B, T)


class UpsampleGenerator(nn.Module):
    style_dim: int
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    upsample_rates: Sequence[int] = (4, 5)
    upsample_initial_channel: int = 256
    upsample_last_channel: int = 64
    resblock_dilation_sizes: Sequence[Sequence[int]] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    gen_istft_n_fft: int = 60
    gen_istft_hop_size: int = 15
    sample_rate: int = 24000
    conformer_depth: int = 2

    @nn.compact
    def __call__(
        self, *, mel, style, pitch, energy, voiced, rng, training: bool = False
    ) -> DecoderPrediction:
        """mel (B, frames, C); pitch/voiced (B, frames)."""
        prior_hop = int(
            math.prod(self.upsample_rates) * self.gen_istft_hop_size
        )
        prior = jax.lax.stop_gradient(
            generate_pcph(
                pitch, voiced, prior_hop, self.sample_rate, rng
            )
        )
        har_mag, har_x, har_y = stft_lib.stft_magnitude_unit_phase(
            prior, self.gen_istft_n_fft, self.gen_istft_hop_size,
            self.gen_istft_n_fft, center=True, pad_mode="edge",
        )
        har_phase = jnp.arctan2(har_y * har_mag, har_x * har_mag)
        har = jnp.concatenate(
            [har_mag[:, :, :-1], har_phase[:, :, :-1]], axis=1
        )  # (B, n_fft + 2, T')
        har = jnp.moveaxis(har, 1, 2)  # (B, T', n_fft + 2)

        x = mel
        ch = self.upsample_initial_channel
        n_up = len(self.upsample_rates)
        for i, rate in enumerate(self.upsample_rates):
            alpha = self.param(
                f"alpha_{i}", nn.initializers.ones, (1, 1, x.shape[-1])
            )
            x = snake(x, alpha)
            x = Conformer(
                dim=x.shape[-1], depth=self.conformer_depth,
                attn_dropout=0.1, ff_dropout=0.1, conv_dropout=0.1,
                name=f"conformer_{i}",
            )(x, style, training=training)

            out_ch = ch // (2 ** (i + 1))
            # dense-expand + pixel shuffle (MXU) instead of conv_transpose
            h = Conv1d(out_ch * rate, rate * 2, name=f"up_{i}")(x)
            b, t, _ = h.shape
            x = h.reshape(b, t, rate, out_ch).reshape(b, t * rate, out_ch)

            # harmonic prior injection at this scale
            stride_f0 = int(math.prod(self.upsample_rates[i + 1:]))
            if stride_f0 > 1:
                xs = nn.Conv(
                    out_ch, (stride_f0 * 2,), strides=(stride_f0,),
                    padding=[((stride_f0 + 1) // 2, (stride_f0 + 1) // 2)],
                    name=f"noise_conv_{i}",
                )(har)
            else:
                xs = nn.Conv(out_ch, (1,), name=f"noise_conv_{i}")(har)
            xs = AdaptiveGeneratorBlock(
                out_ch, kernel_size=7 if i + 1 < n_up else 11,
                dilations=(1, 3, 5), name=f"noise_res_{i}",
            )(xs[:, : x.shape[1], :], style)
            frames_i = min(x.shape[1], xs.shape[1])
            x = x[:, :frames_i, :] + xs[:, :frames_i, :]

            acc = None
            for j, (k, d) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                y = AdaptiveGeneratorBlock(
                    out_ch, kernel_size=k, dilations=tuple(d),
                    name=f"resblock_{i}_{j}",
                )(x, style)
                acc = y if acc is None else acc + y
            x = acc / len(self.resblock_kernel_sizes)

        alpha = self.param(
            "alpha_post", nn.initializers.ones, (1, 1, x.shape[-1])
        )
        x = snake(x, alpha)
        x = Conv1d(self.gen_istft_n_fft + 2, 7, name="conv_post")(x)

        half = self.gen_istft_n_fft // 2 + 1
        logamp = x[:, :, :half].astype(jnp.float32)
        phase = x[:, :, half:].astype(jnp.float32)
        spec = jnp.exp(jnp.clip(logamp, -35.0, 35.0))
        real = jnp.moveaxis(spec * jnp.cos(phase), 1, 2)
        imag = jnp.moveaxis(spec * jnp.sin(phase), 1, 2)
        # the ringformer head inverts with torch.istft semantics (window-
        # envelope normalized), unlike the freegan head's raw conv iSTFT:
        # reference TorchSTFT.inverse (generator.py:47-57) calls torch.istft
        audio = stft_lib.istft(
            real, imag, self.gen_istft_n_fft, self.gen_istft_hop_size,
            self.gen_istft_n_fft, center=True, normalize_window=True,
            length=mel.shape[1] * prior_hop,
        )
        return DecoderPrediction(
            audio=jnp.tanh(audio),
            magnitude=jnp.moveaxis(logamp, 1, 2),
            phase=jnp.moveaxis(phase, 1, 2),
        )
