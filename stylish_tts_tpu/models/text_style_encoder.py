"""Text-based style encoder (reference: train/models/text_style_encoder.py).

conv-in + BasicConvNeXt stack + masked mean pool over text positions.
Part of the component inventory (used by the experimental style stage).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import Conv1d, sequence_mask
from .convnext import BasicConvNeXtBlock


class TextStyleEncoder(nn.Module):
    inter_dim: int
    style_dim: int
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, lengths):
        """x: (B, T, inter_dim) -> (B, style_dim)."""
        x = Conv1d(self.style_dim, 7, name="conv_in")(x)
        for i in range(self.n_layers):
            x = BasicConvNeXtBlock(
                self.style_dim, self.style_dim * 4, name=f"block_{i}"
            )(x)
        mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)[..., None]
        return jnp.sum(x * mask, axis=1) / lengths[:, None].astype(x.dtype)
