"""Style-conditioned Conformer (reference: train/models/conformer.py).

Block = 0.5*FFN + attention + depthwise-conv module + 0.5*FFN, each
pre-normed with AdaptiveLayerNorm (style FiLM), post-normed at the end.
The conv module's BatchNorm becomes GroupNorm(1) (see common.py note).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import AdaptiveLayerNorm, Conv1d, Norm1d, sequence_mask


def swish(x):
    return x * jax.nn.sigmoid(x)


class ConformerFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = nn.Dense(self.dim * self.mult)(x)
        x = swish(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Dense(self.dim)(x)
        return nn.Dropout(self.dropout, deterministic=not training)(x)


class ConformerAttention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, *, training: bool = False):
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(self.dim_head)
        if mask is not None:
            keep = mask[:, None, :, None] * mask[:, None, None, :]
            scores = jnp.where(keep > 0, scores, jnp.finfo(scores.dtype).min)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v)
        if mask is not None:
            # torch SDPA returns 0 for fully-masked (padded) query rows;
            # match it so padding never leaks into valid rows via the
            # depthwise conv module.
            out = out * mask[:, :, None, None].astype(out.dtype)
        out = out.reshape(out.shape[0], out.shape[1], inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not training)(out)


class ConformerConvModule(nn.Module):
    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    dropout: float = 0.0
    norm_mode: str = "group"  # "affine" when running imported torch weights

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        inner = self.dim * self.expansion_factor
        x = nn.Dense(inner * 2, name="pw_in")(x)
        gate_in, gate = jnp.split(x, 2, axis=-1)
        x = gate_in * jax.nn.sigmoid(gate)  # GLU
        x = Conv1d(inner, self.kernel_size, groups=inner, name="dwconv")(x)
        x = Norm1d(inner, mode=self.norm_mode, name="bn")(x)
        x = swish(x)
        x = nn.Dense(self.dim, name="pw_out")(x)
        return nn.Dropout(self.dropout, deterministic=not training)(x)


class ConformerBlock(nn.Module):
    dim: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    norm_mode: str = "group"

    @nn.compact
    def __call__(self, x, style, mask=None, *, training: bool = False):
        h = AdaptiveLayerNorm(self.dim, name="ff1_norm")(x, style)
        h = ConformerFeedForward(self.dim, self.ff_mult, self.ff_dropout, name="ff1")(
            h, training=training
        )
        x_ff1 = 0.5 * h + x

        # NOTE: the reference attends the ORIGINAL x, not x_ff1
        # (conformer.py:243-246: x = self.attn(x, ...); x = x + x_ff1)
        h = AdaptiveLayerNorm(self.dim, name="attn_norm")(x, style)
        h = ConformerAttention(
            self.dim, self.heads, self.dim_head, self.attn_dropout, name="attn"
        )(h, mask, training=training)
        h = nn.Dropout(self.attn_dropout, deterministic=not training)(h)
        x = h + x_ff1

        h = AdaptiveLayerNorm(self.dim, name="conv_norm")(x, style)
        h = ConformerConvModule(
            self.dim,
            self.conv_expansion_factor,
            self.conv_kernel_size,
            self.conv_dropout,
            norm_mode=self.norm_mode,
            name="conv",
        )(h, training=training)
        x = h + x

        h = AdaptiveLayerNorm(self.dim, name="ff2_norm")(x, style)
        h = ConformerFeedForward(self.dim, self.ff_mult, self.ff_dropout, name="ff2")(
            h, training=training
        )
        x = 0.5 * h + x
        return AdaptiveLayerNorm(self.dim, name="post_norm")(x, style)


class Conformer(nn.Module):
    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 31
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    conv_dropout: float = 0.0
    norm_mode: str = "group"

    @nn.compact
    def __call__(self, x, style, lengths=None, *, training: bool = False):
        mask = None
        if lengths is not None:
            mask = sequence_mask(lengths, x.shape[1]).astype(x.dtype)
        for i in range(self.depth):
            x = ConformerBlock(
                self.dim,
                self.dim_head,
                self.heads,
                self.ff_mult,
                self.conv_expansion_factor,
                self.conv_kernel_size,
                self.attn_dropout,
                self.ff_dropout,
                self.conv_dropout,
                norm_mode=self.norm_mode,
                name=f"block_{i}",
            )(x, style, mask, training=training)
        return x
