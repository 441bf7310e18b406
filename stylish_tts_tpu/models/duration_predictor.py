"""Duration predictor (reference: train/models/duration_predictor.py:15-87).

Own TextEncoder + style-conditioned self-attention "cross" block +
N AdaptiveConvNeXt blocks + projection to ordinal duration-class
logits; the monotone-cumsum trick (duration_predictor.py:82-86) makes
class logits ordinal: logits are |abs|-cumsum'd then negated.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import DurationPredictorConfig, TextEncoderConfig
from .common import AdaptiveLayerNorm, Conv1d, sequence_mask
from .convnext import AdaptiveConvNeXtBlock
from .text_encoder import RoPEMultiHeadAttention, TextEncoder


class DurationPredictor(nn.Module):
    style_dim: int
    inter_dim: int
    text_config: TextEncoderConfig
    duration_config: DurationPredictorConfig

    @nn.compact
    def __call__(self, texts, text_lengths, style, *, training: bool = False):
        cfg = self.duration_config
        encoding, _, _ = TextEncoder(
            inter_dim=self.inter_dim, config=self.text_config, name="text_encoder"
        )(texts, text_lengths, training=training)
        mask = sequence_mask(text_lengths, texts.shape[1]).astype(encoding.dtype)
        mask3 = mask[..., None]

        # style-conditioned self-attention "cross" block
        query = AdaptiveLayerNorm(self.inter_dim, name="query_norm")(encoding, style)
        key = AdaptiveLayerNorm(self.inter_dim, name="key_norm")(encoding, style)
        attn_mask = mask[:, :, None] * mask[:, None, :]
        attention = RoPEMultiHeadAttention(
            self.inter_dim, self.inter_dim, 8, dropout=0.5, name="cross_attention"
        )(query, key, attn_mask, training=training)
        attention = Conv1d(
            self.inter_dim, 5, groups=self.inter_dim, name="cross_post_dw"
        )(attention)
        attention = nn.silu(attention)
        attention = nn.Dense(self.inter_dim, name="cross_post_pw")(attention)
        prosody = (attention + encoding) / jnp.sqrt(2.0).astype(encoding.dtype)

        for i in range(cfg.n_layer):
            prosody = AdaptiveConvNeXtBlock(
                self.inter_dim,
                self.inter_dim * 4,
                dropout=cfg.dropout,
                name=f"convnext_{i}",
            )(prosody, style, training=training)
            prosody = prosody * mask3
            prosody = nn.Dropout(
                cfg.last_dropout,
                deterministic=not training,
                broadcast_dims=(1,),  # channel dropout like torch Dropout1d
            )(prosody)

        duration = nn.Dense(cfg.duration_classes, name="duration_proj")(prosody)
        # ordinal monotone-cumsum: later classes only less likely
        rest = jnp.abs(duration[:, :, 1:])
        duration = jnp.concatenate([duration[:, :, :1], rest], axis=-1)
        duration = jnp.cumsum(duration, axis=-1)
        duration = -jnp.abs(duration)
        return duration * mask3
