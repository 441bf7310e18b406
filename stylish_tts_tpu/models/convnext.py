"""ConvNeXt block variants (reference: train/models/conv_next.py:21-133).

All blocks: depthwise conv(k=7) -> norm -> pointwise expand -> activation
-> GRN -> pointwise contract, residual.  Pointwise convs are Dense layers
(MXU matmuls); only the tiny depthwise conv runs on the VPU.
"""

from __future__ import annotations

from flax import linen as nn

from .common import (
    AdaptiveLayerNorm,
    Conv1d,
    DropPath,
    GRN,
    snake,
)


class BasicConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    kernel: int = 7

    @nn.compact
    def __call__(self, x):
        res = x
        x = Conv1d(self.dim, self.kernel, groups=self.dim, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(self.intermediate_dim)(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return res + x


class GeneratorConvNeXtBlock(nn.Module):
    """Style-conditioned ConvNeXt with snake activation (conv_next.py:57)."""

    dim: int
    intermediate_dim: int

    @nn.compact
    def __call__(self, x, style):
        res = x
        x = Conv1d(self.dim, 7, groups=self.dim, name="dwconv")(x)
        x = AdaptiveLayerNorm(self.dim, eps=1e-6, name="norm")(x, style)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        alpha = self.param(
            "snake", nn.initializers.ones, (1, 1, self.intermediate_dim)
        )
        x = snake(x, alpha)
        x = GRN(self.intermediate_dim)(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        return res + x


class AdaptiveConvNeXtBlock(nn.Module):
    """Style-conditioned ConvNeXt with GELU + DropPath (conv_next.py:96)."""

    dim: int
    intermediate_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, style, *, training: bool = False):
        res = x
        x = Conv1d(self.dim, 7, groups=self.dim, name="dwconv")(x)
        x = AdaptiveLayerNorm(self.dim, eps=1e-6, name="norm")(x, style)
        x = nn.Dense(self.intermediate_dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(self.intermediate_dim)(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        x = DropPath(self.dropout)(x, training=training)
        return res + x
