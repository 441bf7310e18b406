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

    @nn.compact
    def __call__(self, x):
        # Spectrally normalize the kernel (stateless power iteration).
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel + (x.shape[-1] // self.groups, self.features),
        )
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


class ResBlk2d(nn.Module):
    """Downsampling residual block (reference mel_style_encoder.py:69-118)."""

    dim_in: int
    dim_out: int
    downsample: str = "half"  # "half" or "none"

    @nn.compact
    def __call__(self, x):
        # shortcut
        sc = x
        if self.dim_in != self.dim_out:
            sc = SNConv2d(self.dim_out, (1, 1), use_bias=False, name="conv1x1")(sc)
        if self.downsample == "half":
            sc = nn.avg_pool(sc, (2, 2), strides=(2, 2), padding="SAME")
        # residual
        h = nn.leaky_relu(x, 0.2)
        h = SNConv2d(self.dim_in, (3, 3), name="conv1")(h)
        if self.downsample == "half":
            # learned strided depthwise downsample
            h = SNConv2d(
                self.dim_in,
                (3, 3),
                strides=(2, 2),
                groups=self.dim_in,
                name="down",
            )(h)
        h = nn.leaky_relu(h, 0.2)
        h = SNConv2d(self.dim_out, (3, 3), name="conv2")(h)
        return (sc + h) / jnp.sqrt(2.0).astype(x.dtype)


class MelStyleEncoderCore(nn.Module):
    dim_in: int
    style_dim: int
    max_conv_dim: int
    skip_last_downsample: bool

    @nn.compact
    def __call__(self, x):
        """x: (B, mel, frames, 1) -> (B, style_dim)."""
        h = SNConv2d(self.dim_in, (3, 3), name="stem")(x)
        dim_in = self.dim_in
        for i in range(4):
            dim_out = min(dim_in * 2, self.max_conv_dim)
            down = "none" if (i == 3 and self.skip_last_downsample) else "half"
            h = ResBlk2d(dim_in, dim_out, down, name=f"res_{i}")(h)
            dim_in = dim_out
        h = nn.leaky_relu(h, 0.2)
        h = SNConv2d(dim_in, (5, 5), padding="VALID", name="post")(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.style_dim, name="out")(h)


class MelStyleEncoder(nn.Module):
    """(B, mel, frames) style mel -> (B, style_dim)."""

    dim_in: int = 80
    style_dim: int = 64
    max_conv_dim: int = 384
    skip_last_downsample: bool = True

    @nn.compact
    def __call__(self, style_mel):
        x = style_mel[..., None]  # (B, mel, frames, 1)
        return MelStyleEncoderCore(
            self.dim_in, self.style_dim, self.max_conv_dim, self.skip_last_downsample,
            name="core",
        )(x)


class PitchStyleEncoder(nn.Module):
    """(style_mel (B,mel,frames'), pitch (B,T), energy (B,T)) -> style."""

    dim_in: int = 80
    style_dim: int = 64
    max_conv_dim: int = 384
    skip_last_downsample: bool = True
    coarse_multiplier: int = 1

    @nn.compact
    def __call__(self, style_mel, pitch, energy):
        target = pitch.shape[-1] // self.coarse_multiplier
        pitch_c = jax.image.resize(pitch, (pitch.shape[0], target), "linear")
        energy_c = jax.image.resize(energy, (energy.shape[0], target), "linear")
        # match the style-mel frame axis
        frames = style_mel.shape[-1]
        pitch_c = jax.image.resize(pitch_c, (pitch.shape[0], frames), "linear")
        energy_c = jax.image.resize(energy_c, (energy.shape[0], frames), "linear")
        x = jnp.concatenate(
            [style_mel, pitch_c[:, None, :], energy_c[:, None, :]], axis=1
        )
        # 1x1 preconv back to dim_in rows, then the shared 2D core
        x = jnp.moveaxis(x, 1, 2)  # (B, frames, mel+2)
        x = nn.Dense(self.dim_in, name="preconv")(x)
        x = jnp.moveaxis(x, 1, 2)[..., None]  # (B, mel, frames, 1)
        return MelStyleEncoderCore(
            self.dim_in, self.style_dim, self.max_conv_dim, self.skip_last_downsample,
            name="core",
        )(x)
