"""Benchmark: flagship vocoder-path inference RTF on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.md): RTF <= 0.02 per v5e chip;
vs_baseline = 0.02 / measured_rtf (>1 means better than target).
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.ops import DurationProcessor

    mc = ModelConfig()  # full-size model
    models = build_model(mc)
    sp = models["speech_predictor"]

    # ~10.2 s of audio per call at 24 kHz (hop 300, 816 frames)
    B, L, F = 1, 128, 816
    audio_seconds = F * mc.hop_length / mc.sample_rate
    rng = jax.random.PRNGKey(0)
    texts = jnp.ones((B, L), jnp.int32)
    lengths = jnp.full((B,), L, jnp.int32)
    align = DurationProcessor().duration_to_alignment(
        jnp.full((B, L), F / L), F
    )
    pitch = jnp.full((B, F), 130.0)
    energy = jnp.zeros((B, F))
    voiced = jnp.ones((B, F))
    style = jnp.zeros((B, mc.style_dim))
    params = sp.init(
        {"params": rng}, texts, lengths, align, pitch, energy, voiced, style,
        pitch, rng=rng,
    )

    @jax.jit
    def forward(params, texts, lengths, align, pitch, energy, voiced, style):
        return sp.apply(
            params, texts, lengths, align, pitch, energy, voiced, style,
            pitch, rng=jax.random.PRNGKey(0),
        ).audio

    args = (params, texts, lengths, align, pitch, energy, voiced, style)
    # warmup/compile
    forward(*args).block_until_ready()

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = forward(*args)
    out.block_until_ready()
    elapsed = time.perf_counter() - t0
    rtf = elapsed / (n_iters * B * audio_seconds)

    print(json.dumps({
        "metric": "vocoder_path_inference_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.02 / rtf, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
