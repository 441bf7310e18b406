"""Component-level timings of the acoustic step (forward-only pieces).

Identifies where the step time goes: vocoder fwd, discriminator fwds,
multi-spectrogram, style encoder.  Run on the TPU.
"""

from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import json
import time

import numpy as np


def bench(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.dsp.multi_spectrogram import MultiSpectrogram
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.ops.duration import DurationProcessor
    from stylish_tts_tpu.trainer.init import init_all_params

    mc = ModelConfig()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    B, L, F = 16, 64, 240
    S = F * mc.hop_length
    r = np.random.default_rng(0)
    audio = jnp.asarray((r.standard_normal((B, S)) * 0.1).astype(np.float32))
    texts = jnp.asarray(r.integers(1, 170, (B, L)).astype(np.int32))
    lengths = jnp.full((B,), L, jnp.int32)
    align = DurationProcessor().duration_to_alignment(
        jnp.full((B, L), F / L), F
    )
    pitch = jnp.full((B, F), 120.0)
    energy = jnp.zeros((B, F))
    voiced = jnp.ones((B, F))
    style = jnp.zeros((B, mc.style_dim))
    style_mel = jnp.asarray(
        r.standard_normal((B, 80, F)).astype(np.float32)
    )
    spec = jnp.asarray(r.random((B, 1, 257, 563)).astype(np.float32))

    ms = MultiSpectrogram(sample_rate=mc.sample_rate)
    timings = {}

    sp = jax.jit(lambda p, *a: models["speech_predictor"].apply(
        p, *a, rng=jax.random.PRNGKey(0)).audio)
    timings["speech_predictor_fwd_ms"] = bench(
        sp, params["speech_predictor"], texts, lengths, align, pitch,
        energy, voiced, style, pitch,
    )
    mspec = jax.jit(lambda a: ms(a).fft_mag)
    timings["multi_spectrogram_ms"] = bench(mspec, audio)
    mrd = jax.jit(lambda p, s: models["mrd0"].apply(p, s))
    timings["mrd_fwd_ms"] = bench(mrd, params["mrd0"], spec)
    cf = jax.jit(lambda p, a: models["disc"].apply(p, a))
    timings["ctxfree_disc_fwd_ms"] = bench(cf, params["disc"], audio)
    se = jax.jit(lambda p, m: models["speech_style_encoder"].apply(p, m))
    timings["style_encoder_fwd_ms"] = bench(se, params["speech_style_encoder"],
                                            style_mel)
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}))


if __name__ == "__main__":
    main()
