"""Text encoder: embedding + conv prenet + RoPE transformer.

Capability parity with the reference TextEncoder
(reference: train/models/text_encoder.py:397-463): token embedding
scaled by sqrt(d), a 3-layer ConvReluNorm prenet (k=5) with residual,
an N-layer transformer whose attention applies rotary embeddings to
half of each head's dims (text_encoder.py:200, d_rope = head_dim/2),
conv-FFN layers, and a final 1x1 projection to inter_dim.

TPU-native: attention is jax.nn.dot_product_attention over (B, T, H, D)
with an additive mask; sequences are padded to bucket lengths so every
shape is static.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TextEncoderConfig
from .common import Conv1d, LayerNormChannels, sequence_mask


def rope_rotate(x: jnp.ndarray, rope_dim: int, base: float = 10_000.0):
    """Apply rotary position embedding to the first ``rope_dim`` features.

    x: (B, T, H, D).  Matches the labml-style RoPE the reference uses
    (text_encoder.py:89-168): theta pairs are (i, i + rope_dim/2).
    """
    t = x.shape[1]
    d2 = rope_dim // 2
    theta = 1.0 / (base ** (jnp.arange(0, rope_dim, 2, dtype=jnp.float32) / rope_dim))
    idx_theta = jnp.arange(t, dtype=jnp.float32)[:, None] * theta[None, :]  # (T, d2)
    cos = jnp.concatenate([jnp.cos(idx_theta), jnp.cos(idx_theta)], axis=-1)
    sin = jnp.concatenate([jnp.sin(idx_theta), jnp.sin(idx_theta)], axis=-1)
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    x_rope, x_pass = x[..., :rope_dim], x[..., rope_dim:]
    neg_half = jnp.concatenate([-x_rope[..., d2:], x_rope[..., :d2]], axis=-1)
    x_rope = x_rope * cos + neg_half * sin
    return jnp.concatenate([x_rope, x_pass], axis=-1)


class RoPEMultiHeadAttention(nn.Module):
    """MHA with rotary embeddings on half the head dims (text_encoder.py:171)."""

    channels: int
    out_channels: int
    n_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        *,
        training: bool = False,
    ) -> jnp.ndarray:
        head_dim = self.channels // self.n_heads
        q = nn.Dense(self.channels, name="q")(x)
        k = nn.Dense(self.channels, name="k")(context)
        v = nn.Dense(self.channels, name="v")(context)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.n_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        rope_dim = head_dim // 2
        q = rope_rotate(q, rope_dim)
        k = rope_rotate(k, rope_dim)

        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(head_dim)
        if mask is not None:
            # mask: (B, T, S) or (B, 1, T, S) keep-mask.  ADDITIVE -1e4 like
            # the reference (text_encoder.py:258-268) — for fully-masked
            # (padded) rows this is softmax-shift-invariant, so pad rows get
            # softmax(raw scores), which can leak into valid frames through
            # later convs; replace-style masking would diverge from torch.
            if mask.ndim == 3:
                mask = mask[:, None]
            scores = scores - 1e4 * (1.0 - (mask > 0).astype(scores.dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = jnp.einsum("bhts,bshd->bthd", attn.astype(v.dtype), v)
        out = out.reshape(out.shape[0], out.shape[1], self.channels)
        return nn.Dense(self.out_channels, name="out")(out)


class ConvFFN(nn.Module):
    """Conv feed-forward (reference FFN text_encoder.py:306-330)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, *, training: bool = False):
        x = Conv1d(self.filter_channels, self.kernel_size, name="conv1")(x * x_mask)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = Conv1d(self.out_channels, self.kernel_size, name="conv2")(x * x_mask)
        return x * x_mask


class ConvReluNorm(nn.Module):
    """Conv prenet with residual zero-init projection (text_encoder.py:36)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int = 5
    n_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, x_mask, *, training: bool = False):
        res = x
        for i in range(self.n_layers):
            x = Conv1d(self.hidden_channels, self.kernel_size, name=f"conv_{i}")(
                x * x_mask
            )
            x = LayerNormChannels(name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        proj = nn.Dense(
            self.out_channels,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(x)
        return (res + proj) * x_mask


class TransformerEncoder(nn.Module):
    """Self-attention encoder (reference Encoder text_encoder.py:333-394)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, *, training: bool = False):
        # x_mask: (B, T, 1); build (B, T, T) keep mask
        m = x_mask[:, :, 0]
        attn_mask = m[:, :, None] * m[:, None, :]
        for i in range(self.n_layers):
            x = x * x_mask
            y = RoPEMultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                dropout=self.dropout,
                name=f"attn_{i}",
            )(x, x, attn_mask, training=training)
            y = nn.Dropout(self.dropout, deterministic=not training)(y)
            x = LayerNormChannels(name=f"norm1_{i}")(x + y)
            y = ConvFFN(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                dropout=self.dropout,
                name=f"ffn_{i}",
            )(x, x_mask, training=training)
            y = nn.Dropout(self.dropout, deterministic=not training)(y)
            x = LayerNormChannels(name=f"norm2_{i}")(x + y)
        return x * x_mask


class TextEncoder(nn.Module):
    """Token ids -> (encoding (B,T,inter_dim), hidden (B,T,hidden), mask (B,T,1))."""

    inter_dim: int
    config: TextEncoderConfig

    @nn.compact
    def __call__(self, texts, text_lengths, *, training: bool = False):
        cfg = self.config
        emb = nn.Embed(
            cfg.tokens,
            cfg.hidden_dim,
            embedding_init=nn.initializers.normal(cfg.hidden_dim**-0.5),
            name="emb",
        )(texts)
        x = emb * math.sqrt(cfg.hidden_dim)
        x_mask = sequence_mask(text_lengths, texts.shape[1]).astype(x.dtype)[..., None]
        x = ConvReluNorm(
            cfg.hidden_dim, cfg.hidden_dim, kernel_size=5, n_layers=3, dropout=0.5,
            name="prenet",
        )(x, x_mask, training=training)
        x = TransformerEncoder(
            cfg.hidden_dim,
            cfg.filter_channels,
            cfg.heads,
            cfg.layers,
            cfg.kernel_size,
            cfg.dropout,
            name="encoder",
        )(x, x_mask, training=training)
        mu = nn.Dense(self.inter_dim, name="proj")(x) * x_mask
        return mu, x, x_mask
