"""Benchmark: flagship vocoder-path inference RTF on one TPU chip,
plus the acoustic G+D training-step time (driver-captured training perf).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline target (BASELINE.md): RTF <= 0.02 per v5e chip;
vs_baseline = 0.02 / measured_rtf (>1 means better than target).
"extra" carries the acoustic G+D train-step measurement (B=16 x 3 s,
bf16 — the PERF.md configuration) so training throughput is recorded
round-over-round by the driver, per VERDICT.md round-1 item 1(b).
"""

from __future__ import annotations

import json
import sys
import time


def bench_train_step(batch: int = 16, frames: int = 240, iters: int = 10):
    """Acoustic G+D step time on the full-size model (reference parity:
    /root/reference/src/stylish_tts/train/stage_type.py acoustic stage)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.trainer.init import init_all_params
    from stylish_tts_tpu.trainer.normalization import NormalizationStats
    from stylish_tts_tpu.trainer.state import create_train_state
    from stylish_tts_tpu.trainer.steps import (
        Batch, StepContext, make_acoustic_step,
    )

    mc = ModelConfig()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=10000, base_lr=1e-4, mixed_precision=True,
    )

    B, L, F = batch, 64, frames
    S = F * mc.hop_length
    rngnp = np.random.default_rng(0)
    data = Batch(
        jnp.asarray((rngnp.standard_normal((B, S)) * 0.1).astype(np.float32)),
        jnp.asarray(rngnp.integers(1, 170, (B, L)).astype(np.int32)),
        jnp.full((B,), L, jnp.int32),
        jnp.full((B, F), 120.0, jnp.float32),
        jnp.full((B, L), F // L, jnp.int32),
    )
    step = jax.jit(make_acoustic_step(ctx), donate_argnums=())
    state, metrics = step(state, data)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    audio_sec = B * S / 24000
    return {
        "acoustic_step_ms": round(dt * 1000, 2),
        "audio_sec_per_wall_sec": round(audio_sec / dt, 1),
        "batch": B,
        "frames": F,
        "mixed_precision": True,
    }


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

    try:
        extra = bench_train_step()
    except Exception as exc:  # keep the primary metric even if training OOMs
        extra = {"train_step_error": f"{type(exc).__name__}: {exc}"[:300]}

    print(json.dumps({
        "metric": "vocoder_path_inference_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.02 / rtf, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
