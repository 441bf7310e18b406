"""Mel reference style encoders (reference: train/models/mel_style_encoder.py).

MelStyleEncoder: 2D conv stem + 4 spectrally-normalized residual
downsample blocks + global average pool + linear -> style vector.
PitchStyleEncoder additionally concatenates coarse-resampled pitch and
energy rows before the stem (mel_style_encoder.py:155-206).

Layout is (B, H=mel, W=frames, C) NHWC; spectral norm is the stateless
power-iteration normalizer from common.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import spectral_normalize


class SNConv2d(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"
    groups: int = 1
    use_bias: bool = True
    sn: bool = True  # False for imported torch weights (already folded)

    @nn.compact
    def __call__(self, x):
        # Spectrally normalize the kernel (stateless power iteration).
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel + (x.shape[-1] // self.groups, self.features),
        )
        if self.sn:
            kernel = spectral_normalize(kernel)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=self.padding
            if isinstance(self.padding, str)
            else [(p, p) for p in self.padding],
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + (bias if bias is not None else 0.0)


def _torch_avg_pool_half(x: jnp.ndarray) -> jnp.ndarray:
    """Exact reference DownSample('half') (mel_style_encoder.py:48-61):
    replicate-pad the frame axis (W) to even, then 2x2 non-overlapping
    mean; an odd height row is dropped (torch avg_pool2d floor)."""
    b, h, w, c = x.shape
    if w % 2 != 0:
        x = jnp.concatenate([x, x[:, :, -1:, :]], axis=2)
        w += 1
    if h % 2 != 0:
        x = x[:, : h - 1]
        h -= 1
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(2, 4))


class ResBlk2d(nn.Module):
    """Downsampling residual block (reference mel_style_encoder.py:69-118)."""

    dim_in: int
    dim_out: int
    downsample: str = "half"  # "half" or "none"
    sn: bool = True

    @nn.compact
    def __call__(self, x):
        # shortcut
        sc = x
        if self.dim_in != self.dim_out:
            sc = SNConv2d(
                self.dim_out, (1, 1), use_bias=False, sn=self.sn, name="conv1x1"
            )(sc)
        if self.downsample == "half":
            sc = _torch_avg_pool_half(sc)
        # residual
        h = nn.leaky_relu(x, 0.2)
        h = SNConv2d(self.dim_in, (3, 3), sn=self.sn, name="conv1")(h)
        if self.downsample == "half":
            # learned strided depthwise downsample; explicit (1,1) padding
            # to align windows with torch Conv2d(stride=2, padding=1)
            h = SNConv2d(
                self.dim_in,
                (3, 3),
                strides=(2, 2),
                padding=(1, 1),
                groups=self.dim_in,
                sn=self.sn,
                name="down",
            )(h)
        h = nn.leaky_relu(h, 0.2)
        h = SNConv2d(self.dim_out, (3, 3), sn=self.sn, name="conv2")(h)
        return (sc + h) / jnp.sqrt(2.0).astype(x.dtype)


class MelStyleEncoderCore(nn.Module):
    dim_in: int
    style_dim: int
    max_conv_dim: int
    skip_last_downsample: bool
    sn: bool = True

    @nn.compact
    def __call__(self, x):
        """x: (B, mel, frames, 1) -> (B, style_dim)."""
        h = SNConv2d(self.dim_in, (3, 3), sn=self.sn, name="stem")(x)
        dim_in = self.dim_in
        for i in range(4):
            dim_out = min(dim_in * 2, self.max_conv_dim)
            down = "none" if (i == 3 and self.skip_last_downsample) else "half"
            h = ResBlk2d(dim_in, dim_out, down, sn=self.sn, name=f"res_{i}")(h)
            dim_in = dim_out
        h = nn.leaky_relu(h, 0.2)
        h = SNConv2d(dim_in, (5, 5), padding="VALID", sn=self.sn, name="post")(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.style_dim, name="out")(h)


class MelStyleEncoder(nn.Module):
    """(B, mel, frames) style mel -> (B, style_dim)."""

    dim_in: int = 80
    style_dim: int = 64
    max_conv_dim: int = 384
    skip_last_downsample: bool = True
    sn: bool = True

    @nn.compact
    def __call__(self, style_mel):
        x = style_mel[..., None]  # (B, mel, frames, 1)
        return MelStyleEncoderCore(
            self.dim_in, self.style_dim, self.max_conv_dim, self.skip_last_downsample,
            sn=self.sn, name="core",
        )(x)


class PitchStyleEncoder(nn.Module):
    """(style_mel (B,mel,frames'), pitch (B,T), energy (B,T)) -> style."""

    dim_in: int = 80
    style_dim: int = 64
    max_conv_dim: int = 384
    skip_last_downsample: bool = True
    coarse_multiplier: int = 1
    sn: bool = True

    @nn.compact
    def __call__(self, style_mel, pitch, energy):
        target = pitch.shape[-1] // self.coarse_multiplier
        pitch_c = jax.image.resize(pitch, (pitch.shape[0], target), "linear", antialias=False)
        energy_c = jax.image.resize(energy, (energy.shape[0], target), "linear", antialias=False)
        # match the style-mel frame axis
        frames = style_mel.shape[-1]
        pitch_c = jax.image.resize(pitch_c, (pitch.shape[0], frames), "linear", antialias=False)
        energy_c = jax.image.resize(energy_c, (energy.shape[0], frames), "linear", antialias=False)
        x = jnp.concatenate(
            [style_mel, pitch_c[:, None, :], energy_c[:, None, :]], axis=1
        )
        # 1x1 preconv back to dim_in rows.  The reference preconv is
        # weight_norm(Conv1d(dim_in+2, dim_in, kernel=1, padding=1))
        # (mel_style_encoder.py:166) — kernel 1 with padding 1 GROWS the
        # frame axis by 2 (the edge columns are bias-only); reproduced
        # here by zero-padding frames before the pointwise Dense.
        x = jnp.moveaxis(x, 1, 2)  # (B, frames, mel+2)
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        x = nn.Dense(self.dim_in, name="preconv")(x)
        x = jnp.moveaxis(x, 1, 2)[..., None]  # (B, mel, frames+2, 1)
        return MelStyleEncoderCore(
            self.dim_in, self.style_dim, self.max_conv_dim, self.skip_last_downsample,
            sn=self.sn, name="core",
        )(x)
