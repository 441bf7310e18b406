"""Shared building blocks (flax.linen, channels-last).

Capability parity with the reference's style-conditioned norm zoo
(reference: src/stylish_tts/train/models/ada_norm.py, common.py,
conv_next.py): every norm is FiLM-modulated by the 64-d style vector.

TPU-first design choices (deliberate deviations from the torch code):
  * layout is (batch, time, channels) — channels ride the 128-wide lane
    dimension, convs are NWC, matmuls hit the MXU without transposes;
  * BatchNorm is replaced by GroupNorm(1) everywhere — batch-independent,
    nothing to sync across the mesh, no mutable running stats inside jit;
  * weight-norm / spectral-norm reparametrizations are replaced by plain
    kernels (weight norm) and a stateless 3-step power-iteration spectral
    normalizer (spectral norm) — pure functions, no variable collections.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask, True inside the sequence."""
    pos = jnp.arange(max_length)[None, :]
    return pos < lengths[:, None]


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation x + sin^2(alpha*x)/alpha (periodic inductive bias)."""
    return x + (1.0 / alpha) * jnp.square(jnp.sin(alpha * x))


def spectral_normalize(kernel: jnp.ndarray, n_iter: int = 3) -> jnp.ndarray:
    """Stateless spectral normalization of a conv/dense kernel.

    Power iteration started from a deterministic vector; pure function of
    the weights so it stays jit-friendly with no mutable state.
    """
    w = kernel.reshape(-1, kernel.shape[-1])
    u = jnp.ones((w.shape[0],), dtype=w.dtype) / jnp.sqrt(w.shape[0])
    for _ in range(n_iter):
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u = w @ v
        u = u / (jnp.linalg.norm(u) + 1e-12)
    sigma = u @ (w @ v)
    sigma = jax.lax.stop_gradient(jnp.maximum(sigma, 1e-12)) / 1.0
    return kernel / sigma


class Norm1d(nn.Module):
    """Feature-axis norm with two modes.

    * ``group``  — GroupNorm(1) over (spatial, features): the TPU-first
      training norm replacing the reference's BatchNorm (batch-independent,
      no mutable running stats inside jit).
    * ``affine`` — frozen per-channel scale/bias.  Exactly BatchNorm in
      eval mode with folded running stats; used when importing trained
      torch checkpoints (see convert/torch_import.py) so the computed
      function matches the reference bit-for-bit.
    """

    channels: int
    mode: str = "group"  # "group" | "affine"
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "group":
            return nn.GroupNorm(
                num_groups=1, use_scale=self.use_scale, use_bias=self.use_bias,
                name="norm",
            )(x)
        assert self.mode == "affine", self.mode
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        return x * scale + bias


class StyleFiLM(nn.Module):
    """style vector -> (1+gamma, beta) modulation of the last axis."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.channels * 2, name="fc")(style)
        gamma, beta = jnp.split(h, 2, axis=-1)
        while gamma.ndim < x.ndim:
            gamma = gamma[:, None]
            beta = beta[:, None]
        return (1.0 + gamma) * x + beta


class AdaptiveLayerNorm(nn.Module):
    """LayerNorm over channels with style FiLM (reference ada_norm.py:195)."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        x = nn.LayerNorm(epsilon=self.eps, use_bias=False, use_scale=False)(x)
        return StyleFiLM(self.channels)(x, style)


class AdaptiveInstanceNorm(nn.Module):
    """Instance norm over time per channel with style FiLM (ada_norm.py:129).

    x: (B, T, C); statistics are over T.
    """

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return StyleFiLM(self.channels)(x, style)


class LayerNormChannels(nn.Module):
    """Plain LayerNorm over the channel axis (reference text_encoder.py:15)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.eps)(x)


class Conv1d(nn.Module):
    """1D conv over (B, T, C) with torch-style symmetric padding."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad: str | int = "same"  # "same", "valid", or explicit pad count

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.pad == "same":
            p = get_padding(self.kernel_size, self.dilation)
            padding = [(p, p)]
        elif self.pad == "valid":
            padding = "VALID"
        else:
            padding = [(self.pad, self.pad)]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            padding=padding,
        )(x)


class GRN(nn.Module):
    """Global Response Normalization (reference conv_next.py:7).

    x: (B, T, C).  The torch code computes the L2 norm over dim=1 (time)
    and normalizes by its mean over channels; same semantics here.
    """

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class AdaptiveDecoderBlock(nn.Module):
    """AdaIN residual conv block (reference ada_norm.py:143-192)."""

    dim_in: int
    dim_out: int
    dropout: float = 0.0
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, style, *, training: bool = False):
        res = x
        h = AdaptiveInstanceNorm(self.dim_in, name="norm1")(x, style)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = Conv1d(self.dim_out, self.kernel_size, name="conv1")(h)
        h = AdaptiveInstanceNorm(self.dim_out, name="norm2")(h, style)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = Conv1d(self.dim_out, self.kernel_size, name="conv2")(h)
        if self.dim_in != self.dim_out:
            res = Conv1d(self.dim_out, 1, use_bias=False, name="shortcut")(res)
        return (h + res) / jnp.sqrt(2.0).astype(x.dtype)


class AdaptiveGeneratorBlock(nn.Module):
    """Snake + AdaIN dilated resblock (reference ada_norm.py:11-120)."""

    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)

    @nn.compact
    def __call__(self, x, style):
        for i, dilation in enumerate(self.dilations):
            alpha1 = self.param(
                f"alpha1_{i}", nn.initializers.ones, (1, 1, self.channels)
            )
            alpha2 = self.param(
                f"alpha2_{i}", nn.initializers.ones, (1, 1, self.channels)
            )
            h = AdaptiveInstanceNorm(self.channels, name=f"adain1_{i}")(x, style)
            h = snake(h, alpha1)
            h = Conv1d(
                self.channels, self.kernel_size, dilation=dilation, name=f"conv1_{i}"
            )(h)
            h = AdaptiveInstanceNorm(self.channels, name=f"adain2_{i}")(h, style)
            h = snake(h, alpha2)
            h = Conv1d(self.channels, self.kernel_size, name=f"conv2_{i}")(h)
            x = x + h
        return x


class DropPath(nn.Module):
    """Stochastic depth over the batch axis (reference conv_next.py:138)."""

    rate: float

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        if not training or self.rate <= 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape).astype(x.dtype)
        return x * mask / keep
