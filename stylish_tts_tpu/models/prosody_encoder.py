"""Prosody encoder (reference: train/models/prosody_encoder.py:10-81).

3-layer style-concatenated self-attention stack: each layer re-appends
the style vector to the channel dim, attends (RoPE MHA), AdaLN-norms,
conv-FFNs, and projects back to d_model.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .common import AdaptiveLayerNorm, sequence_mask
from .text_encoder import ConvFFN, RoPEMultiHeadAttention


class ProsodyEncoder(nn.Module):
    style_dim: int
    d_model: int
    n_layers: int = 3
    dropout: float = 0.2
    n_heads: int = 2
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x, style, lengths, *, training: bool = False):
        """x: (B, T, d_model) text encoding -> (B, T, d_model + style_dim)."""
        hidden = self.d_model + self.style_dim
        x_mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)[..., None]
        m = x_mask[:, :, 0]
        attn_mask = m[:, :, None] * m[:, None, :]
        style_tiled = jnp.broadcast_to(
            style[:, None, :], (x.shape[0], x.shape[1], self.style_dim)
        )
        x = jnp.concatenate([x, style_tiled], axis=-1)
        for i in range(self.n_layers):
            x = x * x_mask
            y = RoPEMultiHeadAttention(
                hidden, hidden, self.n_heads, dropout=self.dropout, name=f"attn_{i}"
            )(x, x, attn_mask, training=training)
            y = nn.Dropout(self.dropout, deterministic=not training)(y)
            x = AdaptiveLayerNorm(hidden, name=f"norm1_{i}")(x + y, style)
            y = ConvFFN(
                hidden, hidden * 2, self.kernel_size, dropout=self.dropout,
                name=f"ffn_{i}",
            )(x, x_mask, training=training)
            y = nn.Dropout(self.dropout, deterministic=not training)(y)
            x = AdaptiveLayerNorm(hidden, name=f"norm2_{i}")(x + y, style)
            x = nn.Dense(self.d_model, name=f"proj_{i}")(x)
            x = jnp.concatenate([x, style_tiled], axis=-1)
        return x * x_mask
