"""GAN discriminators (reference: train/models/discriminator.py,
pitch_discriminator.py).

  * SpecDiscriminator — 5-layer Conv2d stack over one |FFT| resolution
    with per-layer 1-channel score heads (discriminator.py:13-68); one
    instance per multi-spectrogram resolution (mrd0..2).
  * ContextFreeDiscriminator — raw-waveform windows (1024/512 unfold)
    -> conv stack + SE attention + temporal/spectral branches + fusion
    (discriminator.py:93-175, arch from arXiv:2508.15316).
  * PitchDiscriminator — 1D conv stack over prosody curves, used for
    pitch/energy (dim_in=2) and durations (dim_in=1)
    (pitch_discriminator.py:6-68).

BatchNorm -> GroupNorm(1) (see common.py); weight norm dropped.
Each returns a list of per-layer score tensors (B, N) like the
reference, enabling identical LSGAN/TPRLS loss composition.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv1d, Norm1d


class SpecDiscriminator(nn.Module):
    """Input (B, 1, freq, frames) |FFT| magnitude -> 5 score tensors.

    Padding is explicit torch-style (1,1)/(4,4) so strided convs align
    with the reference (XLA "SAME" splits stride-2 padding differently).
    """

    @nn.compact
    def __call__(self, y) -> List[jnp.ndarray]:
        x = jnp.moveaxis(y, 1, -1)  # NHWC: (B, freq, frames, 1)
        results = []
        specs = [
            dict(kernel=(3, 9), strides=(1, 1), pad=((1, 1), (4, 4))),
            dict(kernel=(3, 9), strides=(1, 2), pad=((1, 1), (4, 4))),
            dict(kernel=(3, 9), strides=(1, 2), pad=((1, 1), (4, 4))),
            dict(kernel=(3, 9), strides=(1, 2), pad=((1, 1), (4, 4))),
            dict(kernel=(3, 3), strides=(1, 1), pad=((1, 1), (1, 1))),
        ]
        for i, spec in enumerate(specs):
            x = nn.Conv(
                32, spec["kernel"], strides=spec["strides"], padding=spec["pad"],
                name=f"conv_{i}",
            )(x)
            x = nn.leaky_relu(x, 0.1)
            out = nn.Conv(
                1, (3, 3), padding=((1, 1), (1, 1)), name=f"out_{i}"
            )(x)
            results.append(out.reshape(out.shape[0], -1))
        return results


class ContextFreeBlock(nn.Module):
    dim_out: int
    kernel: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    norm_mode: str = "group"

    @nn.compact
    def __call__(self, x):
        x = Conv1d(
            self.dim_out,
            self.kernel,
            stride=self.stride,
            groups=self.groups,
            use_bias=self.use_bias,
            pad=self.kernel // 2,
            name="conv",
        )(x)
        x = Norm1d(self.dim_out, mode=self.norm_mode, name="norm")(x)
        return nn.gelu(x, approximate=False)


class ContextFreeDiscriminator(nn.Module):
    """Raw audio (B, T) -> one score tensor over 1024-sample windows."""

    dim: int = 64
    norm_mode: str = "group"

    @nn.compact
    def __call__(self, audio) -> List[jnp.ndarray]:
        b, t = audio.shape
        win, step = 1024, 512
        n_win = max((t - win) // step + 1, 1)
        # unfold into overlapping windows -> (B*n_win, win, 1)
        idx = jnp.arange(n_win)[:, None] * step + jnp.arange(win)[None, :]
        x = audio[:, idx]  # (B, n_win, win)
        x = x.reshape(b * n_win, win, 1)

        d = self.dim
        nm = self.norm_mode
        x = ContextFreeBlock(d, 11, stride=4, norm_mode=nm, name="conv0")(x)
        x = ContextFreeBlock(d * 2, 11, stride=4, norm_mode=nm, name="conv1")(x)
        x = ContextFreeBlock(d * 4, 7, stride=2, norm_mode=nm, name="conv2")(x)
        x = ContextFreeBlock(d * 4, 5, stride=2, norm_mode=nm, name="conv3")(x)

        # SE attention over channels
        attn = jnp.mean(x, axis=1, keepdims=True)
        attn = nn.Dense(d * 4, name="attn_fc")(attn)
        x = x * nn.sigmoid(attn)

        temporal = ContextFreeBlock(
            d * 4, 7, groups=8, use_bias=True, norm_mode=nm, name="t0"
        )(x)
        temporal = ContextFreeBlock(
            d * 4, 3, groups=8, use_bias=True, norm_mode=nm, name="t1"
        )(temporal)
        spectral = ContextFreeBlock(
            d * 12, 1, groups=8, use_bias=True, norm_mode=nm, name="s0"
        )(x)
        spectral = ContextFreeBlock(
            d * 4, 1, groups=8, use_bias=True, norm_mode=nm, name="s1"
        )(spectral)
        x = jnp.concatenate([temporal, spectral], axis=-1)
        x = ContextFreeBlock(d * 4, 1, use_bias=True, norm_mode=nm, name="fusion")(x)
        x = nn.Dense(d * 8, name="last0")(x)
        x = nn.relu(x)
        x = nn.Dense(1, name="last1")(x)
        return [x.reshape(b, -1)]


class PeriodDiscriminator(nn.Module):
    """HiFi-GAN period discriminator (reference discriminator.py:178-246;
    defined there but not in build_model — same availability here)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, audio):
        """audio (B, T) -> (score (B, N), fmaps)."""
        b, t = audio.shape
        pad = (self.period - t % self.period) % self.period
        x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
        x = x.reshape(b, -1, self.period, 1)  # (B, T//p, p, 1) NHWC
        fmap = []
        for ch in (32, 128, 512, 1024):
            x = nn.Conv(
                ch, (self.kernel_size, 1), strides=(self.stride, 1),
                padding=((2, 2), (0, 0)),
            )(x)
            x = nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = nn.Conv(1024, (self.kernel_size, 1), padding=((2, 2), (0, 0)))(x)
        x = nn.leaky_relu(x, 0.1)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)))(x)
        fmap.append(x)
        return x.reshape(b, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """Five period discriminators (2,3,5,7,11), concatenated scores
    (reference discriminator.py:249-272)."""

    periods: tuple = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, audio):
        scores, fmaps = [], []
        for p in self.periods:
            s, f = PeriodDiscriminator(period=p, name=f"period_{p}")(audio)
            scores.append(s)
            fmaps.extend(f)
        return jnp.concatenate(scores, axis=1), fmaps


class PitchDiscriminator(nn.Module):
    """(B, C_in, T) stacked prosody curves -> 5 score tensors."""

    dim_hidden: int = 64
    kernel: int = 21

    @nn.compact
    def __call__(self, y) -> List[jnp.ndarray]:
        x = jnp.moveaxis(y, 1, 2)  # (B, T, C)
        results = []
        for i in range(5):
            x = Conv1d(self.dim_hidden, self.kernel, name=f"conv_{i}")(x)
            x = nn.leaky_relu(x, 0.1)
            out = Conv1d(1, self.kernel, name=f"out_{i}")(x)
            results.append(out.reshape(out.shape[0], -1))
        return results
