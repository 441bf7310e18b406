"""TPU throughput profile: acoustic G+D train step + component timings.

Run on the real chip (leave axon env intact):
    python scripts/profile_tpu.py [--frames 240] [--batch 8]
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import time

import numpy as np

from stylish_tts_tpu.utils.jax_cache import setup_persistent_cache

setup_persistent_cache(warn_stderr=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)  # bin 9: 3s audio
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--text", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--slm", action="store_true",
                    help="enable the frozen-WavLM slm loss term")
    ap.add_argument("--donate", action="store_true",
                    help="donate the TrainState (the trainer's hot-loop "
                    "configuration; halves steady-state TrainState HBM)")
    ap.add_argument("--remat", action="store_true",
                    help="generator remat + bf16 discs (memory-saver mode)")
    ap.add_argument("--all-mrd", action="store_true",
                    help="reference-faithful disc phase (all 3 MRDs computed "
                    "+ EMA'd every step) instead of the sampled-only default")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.trainer.init import init_all_params, count_parameters
    from stylish_tts_tpu.trainer.normalization import NormalizationStats
    from stylish_tts_tpu.trainer.state import create_train_state
    from stylish_tts_tpu.trainer.steps import (
        Batch, StepContext, make_acoustic_step,
    )

    mc = ModelConfig()
    if args.remat:
        mc.generator.remat = True
    models = build_model(mc)
    rng = jax.random.PRNGKey(0)
    params = init_all_params(models, mc, rng)
    print(f"params: {count_parameters(params):,}")
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    slm_loss_fn = None
    if args.slm:
        from stylish_tts_tpu.models.slm import wavlm_loss
        from stylish_tts_tpu.trainer.loop import try_load_wavlm_params

        wavlm_params = try_load_wavlm_params(mc.slm.model, allow_random_fallback=True)
        assert wavlm_params is not None, "no WavLM weights available"
        slm_loss_fn = wavlm_loss
        state = state.replace(frozen={"wavlm": wavlm_params})
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=10000, base_lr=1e-4, mixed_precision=args.bf16,
        slm_loss_fn=slm_loss_fn, sampled_mrd_only=not args.all_mrd,
    )

    B, L, F = args.batch, args.text, args.frames
    S = F * mc.hop_length
    rngnp = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray((rngnp.standard_normal((B, S)) * 0.1).astype(np.float32)),
        jnp.asarray(rngnp.integers(1, 170, (B, L)).astype(np.int32)),
        jnp.full((B,), L, jnp.int32),
        jnp.full((B, F), 120.0, jnp.float32),
        jnp.full((B, L), F // L, jnp.int32),
    )

    step = jax.jit(
        make_acoustic_step(ctx),
        donate_argnums=(0,) if args.donate else (),
    )

    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t0
    print(f"compile+first step: {compile_s:.1f}s")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / args.iters
    audio_sec = B * S / mc.sample_rate
    print(json.dumps({
        "acoustic_step_ms": round(dt * 1000, 2),
        "steps_per_sec": round(1.0 / dt, 3),
        "audio_sec_per_step": round(audio_sec, 2),
        "audio_sec_per_wall_sec": round(audio_sec / dt, 1),
        "batch": B, "frames": F,
    }))


if __name__ == "__main__":
    main()
