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


class TransposeConv1d(nn.Module):
    """Exact torch ConvTranspose1d(stride, kernel, padding) over (B, T, C).

    Used only by the import-faithful ringformer path: expresses the
    transposed conv as an lhs-dilated regular conv (XLA decomposes it
    into `stride` strided sub-convs on TPU). The kernel is stored
    pre-flipped in regular-conv layout (k, in, out) — see
    convert.torch_import.convert_upsample_generator for the mapping from
    the torch (in, out, k) ConvTranspose weight. Output length is
    (T-1)*stride + kernel - 2*padding, matching torch exactly
    (reference generator.py:110-118 weight-normed ConvTranspose1d)."""

    features: int
    kernel_size: int
    stride: int
    padding: int  # torch ConvTranspose1d padding

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad = self.kernel_size - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return y + bias


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
    # faithful=True reproduces the torch reference's exact forward for
    # ported checkpoints (tests/test_parity_torch.py): real transposed
    # convs (reference kernel sizes), reflect STFT padding, the last
    # layer's ReflectionPad1d((1,0)) on the prior branch, and no output
    # tanh. The default (False) is the TPU redesign: pixel-shuffle
    # upsampling, edge padding, tanh-bounded output.
    faithful: bool = False
    upsample_kernel_sizes: Sequence[int] | None = None

    @nn.compact
    def __call__(
        self, *, mel, style, pitch, energy, voiced, rng,
        training: bool = False, prior=None,
    ) -> DecoderPrediction:
        """mel (B, frames, C); pitch/voiced (B, frames).

        prior: optional injected excitation waveform replacing the pcph
        harmonic prior — parity harnesses use a broadband injection
        because a harmonic prior's near-zero STFT bins make atan2 phase
        pure round-off noise that no two STFT implementations can agree
        on (same rationale as StepContext.parity_prior)."""
        prior_hop = int(
            math.prod(self.upsample_rates) * self.gen_istft_hop_size
        )
        if prior is None:
            prior = generate_pcph(
                pitch, voiced, prior_hop, self.sample_rate, rng
            )
        prior = jax.lax.stop_gradient(prior)
        har_mag, har_x, har_y = stft_lib.stft_magnitude_unit_phase(
            prior, self.gen_istft_n_fft, self.gen_istft_hop_size,
            self.gen_istft_n_fft, center=True,
            pad_mode="reflect" if self.faithful else "edge",
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
                # imported torch checkpoints carry folded BatchNorm stats
                norm_mode="affine" if self.faithful else "group",
                name=f"conformer_{i}",
            )(x, style, training=training)

            out_ch = ch // (2 ** (i + 1))
            if self.faithful:
                # exact reference ConvTranspose1d (generator.py:110-118)
                k_up = (
                    self.upsample_kernel_sizes[i]
                    if self.upsample_kernel_sizes is not None
                    else rate * 2
                )
                x = TransposeConv1d(
                    out_ch, k_up, rate, (k_up - rate) // 2, name=f"up_{i}"
                )(x)
            else:
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
            if self.faithful and i + 1 == n_up:
                # reference reflection_pad = ReflectionPad1d((1, 0)) on the
                # prior branch of the LAST scale (generator.py:243-246)
                xs = jnp.concatenate([xs[:, 1:2, :], xs], axis=1)
            if not self.faithful:
                xs = xs[:, : x.shape[1], :]
            xs = AdaptiveGeneratorBlock(
                out_ch, kernel_size=7 if i + 1 < n_up else 11,
                dilations=(1, 3, 5), name=f"noise_res_{i}",
            )(xs, style)
            if self.faithful:
                assert x.shape[1] == xs.shape[1], (x.shape, xs.shape)
                x = x + xs
            else:
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
        # the reference head emits raw iSTFT audio (generator.py:255-259);
        # the TPU redesign tanh-bounds it as a from-scratch stabilizer
        return DecoderPrediction(
            audio=audio if self.faithful else jnp.tanh(audio),
            magnitude=jnp.moveaxis(logamp, 1, 2),
            phase=jnp.moveaxis(phase, 1, 2),
        )
