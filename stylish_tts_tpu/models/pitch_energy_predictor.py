"""Pitch/energy predictor (reference: train/models/pitch_energy_predictor.py).

Own TextEncoder -> ProsodyEncoder -> project prosody through the
alignment matrix to frame rate -> twin 4-block AdaptiveDecoderBlock
heads for F0 (Hz) and log-energy.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import (
    DurationPredictorConfig,
    PitchEnergyPredictorConfig,
    TextEncoderConfig,
)
from .common import AdaptiveDecoderBlock
from .prosody_encoder import ProsodyEncoder
from .text_encoder import TextEncoder


class PitchEnergyPredictor(nn.Module):
    style_dim: int
    inter_dim: int
    text_config: TextEncoderConfig
    duration_config: DurationPredictorConfig
    pe_config: PitchEnergyPredictorConfig

    @nn.compact
    def __call__(
        self, texts, text_lengths, alignment, style, *, training: bool = False
    ):
        """alignment: (B, T_text, T_frames) soft alignment matrix.

        Returns (pitch (B, T_frames), energy (B, T_frames)).
        """
        dropout = self.pe_config.dropout
        encoding, _, _ = TextEncoder(
            inter_dim=self.inter_dim, config=self.text_config, name="text_encoder"
        )(texts, text_lengths, training=training)
        prosody = ProsodyEncoder(
            style_dim=self.style_dim,
            d_model=self.inter_dim,
            n_layers=3,
            dropout=0.2,
            name="prosody_encoder",
        )(encoding, style, text_lengths, training=training)

        # project to frame rate: (B, T_text, C)^T @ alignment -> (B, T_frames, C)
        x = jnp.einsum(
            "btc,btf->bfc", prosody, alignment, preferred_element_type=jnp.float32
        ).astype(prosody.dtype)

        d = self.inter_dim
        dims = [(d + self.style_dim, d), (d, d // 2), (d // 2, d // 2), (d // 2, d // 2)]
        # NOTE: prosody already carries style concatenated (d + style_dim ch)
        f0 = x
        for i, (din, dout) in enumerate(dims):
            f0 = AdaptiveDecoderBlock(din, dout, dropout=dropout, name=f"f0_{i}")(
                f0, style, training=training
            )
        f0 = nn.Dense(1, name="f0_proj")(f0)

        n = x
        for i, (din, dout) in enumerate(dims):
            n = AdaptiveDecoderBlock(din, dout, dropout=dropout, name=f"n_{i}")(
                n, style, training=training
            )
        n = nn.Dense(1, name="n_proj")(n)
        return f0[..., 0], n[..., 0]
