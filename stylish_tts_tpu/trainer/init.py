"""Parameter initialization for the full 13-module registry.

Init runs once with tiny dummy shapes (flax param shapes are
independent of sequence length), so start-up cost is negligible.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig


def init_all_params(
    models: Dict[str, Any], mc: ModelConfig, rng: jax.Array,
    frames: int = 40, text_len: int = 12, batch: int = 1,
) -> Dict[str, Any]:
    samples = frames * mc.hop_length
    b, lt, f = batch, text_len, frames
    texts = jnp.ones((b, lt), jnp.int32)
    lengths = jnp.full((b,), lt, jnp.int32)
    align = jnp.ones((b, lt, f)) / lt
    pitch = jnp.full((b, f), 100.0)
    energy = jnp.zeros((b, f))
    voiced = jnp.ones((b, f))
    style = jnp.zeros((b, mc.style_dim))
    mel80 = jnp.zeros((b, f, mc.text_aligner.n_mels))
    style_mel = jnp.zeros((b, mc.style_encoder.n_mels, f))
    audio = jnp.zeros((b, samples))
    spec = jnp.zeros((b, 1, 64, 16))
    pitchcat = jnp.zeros((b, 2, f))
    durrow = jnp.zeros((b, 1, lt))

    keys = jax.random.split(rng, 13)
    params = {}
    params["text_aligner"] = models["text_aligner"].init(
        keys[0], mel80, jnp.full((b,), f, jnp.int32)
    )
    params["duration_predictor"] = models["duration_predictor"].init(
        keys[1], texts, lengths, style
    )
    params["pitch_energy_predictor"] = models["pitch_energy_predictor"].init(
        keys[2], texts, lengths, align, style
    )
    params["speech_predictor"] = models["speech_predictor"].init(
        {"params": keys[3]}, texts, lengths, align, pitch, energy, voiced,
        style, pitch, rng=keys[3],
    )
    params["disc"] = models["disc"].init(keys[4], audio)
    params["mrd0"] = models["mrd0"].init(keys[5], spec)
    params["mrd1"] = models["mrd1"].init(keys[6], spec)
    params["mrd2"] = models["mrd2"].init(keys[7], spec)
    params["speech_style_encoder"] = models["speech_style_encoder"].init(
        keys[8], style_mel
    )
    params["pe_style_encoder"] = models["pe_style_encoder"].init(
        keys[9], style_mel, pitch, energy
    )
    params["duration_style_encoder"] = models["duration_style_encoder"].init(
        keys[10], style_mel
    )
    params["pitch_disc"] = models["pitch_disc"].init(keys[11], pitchcat)
    params["dur_disc"] = models["dur_disc"].init(keys[12], durrow)
    return params


def count_parameters(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
