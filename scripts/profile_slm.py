"""Measure the slm (frozen WavLM) term's acoustic step-time cost on TPU.

Runs the full-size acoustic G+D step (B x 3 s, bf16 — the PERF.md
configuration) twice: without the slm loss and with it (weights from
assets/wavlm-random, the zero-egress fallback; the cost is identical
with pretrained weights).  Reference parity: the torch reference ALWAYS
trains acoustic with this term (reference losses.py:376-394,
stage_type.py:221-225).

Usage: python scripts/profile_slm.py [batch]
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def bench(slm: bool, batch: int, iters: int = 10):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.trainer.init import init_all_params
    from stylish_tts_tpu.trainer.loop import try_load_wavlm_params
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

    slm_loss_fn = None
    if slm:
        from stylish_tts_tpu.models.slm import wavlm_loss

        wavlm_params = try_load_wavlm_params("microsoft/wavlm-base-plus", allow_random_fallback=True)
        if wavlm_params is None:
            raise SystemExit("no WavLM weights; run scripts/make_random_wavlm.py")
        slm_loss_fn = wavlm_loss
        state = state.replace(frozen={"wavlm": wavlm_params})
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=10000, base_lr=1e-4, mixed_precision=True,
        slm_loss_fn=slm_loss_fn,
    )

    B, L, F = batch, 64, 240
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
    t_c0 = time.perf_counter()
    state, metrics = step(state, data)
    jax.block_until_ready(metrics)
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, data)
    jax.block_until_ready(metrics)
    dt = (time.perf_counter() - t0) / iters
    return {
        "slm": slm,
        "batch": B,
        "step_ms": round(dt * 1000, 2),
        "audio_sec_per_wall_sec": round(B * S / 24000 / dt, 1),
        "compile_s": round(compile_s, 1),
        "slm_metric": round(float(metrics.get("slm", -1.0)), 4),
    }


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    off = bench(slm=False, batch=batch)
    on = bench(slm=True, batch=batch)
    overhead = on["step_ms"] / off["step_ms"] - 1.0
    print(json.dumps({
        "off": off, "on": on,
        "slm_overhead_pct": round(overhead * 100, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
