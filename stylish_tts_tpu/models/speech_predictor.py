"""SpeechPredictor: TextEncoder -> Decoder -> MultiGenerator.

The acoustic inference path (reference: train/models/speech_predictor.py:11-73):
text encoding is projected to frame rate through the soft alignment
matrix, decoded with prosody curves, and vocoded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .decoder import Decoder
from .generator import DecoderPrediction, MultiGenerator
from .text_encoder import TextEncoder


class SpeechPredictor(nn.Module):
    model_config: ModelConfig

    @nn.compact
    def __call__(
        self,
        texts,  # (B, T_text) int tokens
        text_lengths,  # (B,)
        alignment,  # (B, T_text, T_frames)
        pitch,  # (B, T_frames) F0 Hz
        energy,  # (B, T_frames) log-energy
        voiced,  # (B, T_frames) 0/1
        style,  # (B, style_dim)
        denormal_pitch,  # (B, T_frames) F0 in Hz for the harmonic source
        *,
        rng: jax.Array,
        training: bool = False,
        prior=None,  # optional precomputed harmonic excitation
        deterministic_prior: bool = False,  # zero sine-source noise/phase
    ) -> DecoderPrediction:
        mc = self.model_config
        text_encoding, _, _ = TextEncoder(
            inter_dim=mc.inter_dim, config=mc.text_encoder, name="text_encoder"
        )(texts, text_lengths, training=training)

        # (B, T_text, C) through alignment -> (B, T_frames, C)
        asr = jnp.einsum(
            "btc,btf->bfc",
            text_encoding,
            alignment,
            preferred_element_type=jnp.float32,
        ).astype(text_encoding.dtype)

        smooth_rng, gen_rng = jax.random.split(rng)
        mel, _ = Decoder(
            dim_in=mc.inter_dim,
            style_dim=mc.style_dim,
            hidden_dim=mc.decoder.hidden_dim,
            residual_dim=mc.decoder.residual_dim,
            name="decoder",
        )(
            asr, pitch, energy, style, voiced, training=training,
            smooth_rng=smooth_rng,
        )

        if mc.generator.type == "ringformer":
            from .ringformer import UpsampleGenerator

            gen = UpsampleGenerator(
                style_dim=mc.style_dim,
                resblock_kernel_sizes=tuple(mc.generator.resblock_kernel_sizes),
                upsample_rates=tuple(mc.generator.upsample_rates),
                upsample_initial_channel=mc.generator.upsample_initial_channel,
                upsample_last_channel=mc.generator.upsample_last_channel,
                resblock_dilation_sizes=tuple(
                    tuple(d) for d in mc.generator.resblock_dilation_sizes
                ),
                gen_istft_n_fft=mc.generator.gen_istft_n_fft,
                gen_istft_hop_size=mc.generator.gen_istft_hop_size,
                sample_rate=mc.sample_rate,
                conformer_depth=mc.generator.depth,
                name="generator",
            )
        else:
            gen = MultiGenerator(
                style_dim=mc.style_dim,
                n_fft=mc.n_fft,
                win_length=mc.win_length,
                hop_length=mc.hop_length,
                sample_rate=mc.sample_rate,
                config=mc.generator,
                name="generator",
            )
        kwargs = (
            {}
            if mc.generator.type == "ringformer"
            else {"prior": prior, "deterministic_prior": deterministic_prior}
        )
        return gen(
            mel=mel,
            style=style,
            pitch=denormal_pitch,
            energy=energy,
            voiced=voiced,
            rng=gen_rng,
            training=training,
            **kwargs,
        )
