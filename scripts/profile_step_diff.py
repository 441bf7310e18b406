"""Bisect the acoustic-step wall time with tunnel-honest diff timing.

Round-5 bench (honest protocol, bench.py _diff_time) measured the
B=16/240f acoustic G+D step at ~3.08 s/execution while the same-session
canary sustained 0.955 MFU — the step runs at 0.76% MFU, ~150x off its
analytic 4.6 TFLOP. This script diff-times the step's components
SEPARATELY (each data-chained through a 1e-30 input perturbation and
forced by a scalar fetch) to find where the 3 s lives: generator
forward, generator loss+grad, multi-spectrogram DSP, discriminator
forwards, and the full step.

Run on the chip: python scripts/profile_step_diff.py [--batch 16]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from stylish_tts_tpu.utils.jax_cache import setup_persistent_cache

setup_persistent_cache(warn_stderr=True)

REPEATS = 3


def diff_bench(step_scalar, seed, n_small=4, n_big=8, repeats=REPEATS):
    """step_scalar(tick)->tick; chained; returns per-call seconds."""
    import jax

    t = step_scalar(seed)  # compile + settle
    _ = jax.device_get(t)

    def run(k):
        t0 = time.perf_counter()
        t = seed
        for _ in range(k):
            t = step_scalar(t)
        _ = jax.device_get(t)
        return time.perf_counter() - t0

    t_small = min(run(n_small) for _ in range(repeats))
    t_big = min(run(n_big) for _ in range(repeats))
    per = (t_big - t_small) / (n_big - n_small)
    return per if per > 0 else t_big / n_big


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=240)
    args = ap.parse_args()

    import jax
    import jax.flatten_util  # noqa: F401  (jax.flatten_util.ravel_pytree)
    import jax.numpy as jnp
    import numpy as np

    from stylish_tts_tpu.config import Config, ModelConfig
    from stylish_tts_tpu.dsp.multi_spectrogram import MultiSpectrogram
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.ops.duration import DurationProcessor
    from stylish_tts_tpu.trainer.init import init_all_params
    from stylish_tts_tpu.trainer.normalization import NormalizationStats
    from stylish_tts_tpu.trainer.state import create_train_state
    from stylish_tts_tpu.trainer.steps import (
        Batch, StepContext, make_acoustic_step,
    )
    from stylish_tts_tpu import losses as L

    mc = ModelConfig()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    B, Ltxt, F = args.batch, 64, args.frames
    S = F * mc.hop_length
    r = np.random.default_rng(0)
    audio = jnp.asarray((r.standard_normal((B, S)) * 0.1).astype(np.float32))
    texts = jnp.asarray(r.integers(1, 170, (B, Ltxt)).astype(np.int32))
    lengths = jnp.full((B,), Ltxt, jnp.int32)
    align = DurationProcessor().duration_to_alignment(
        jnp.full((B, Ltxt), F / Ltxt), F
    )
    pitch = jnp.full((B, F), 120.0)
    energy = jnp.zeros((B, F))
    voiced = jnp.ones((B, F))
    style = jnp.zeros((B, mc.style_dim))

    ms = MultiSpectrogram(sample_rate=mc.sample_rate)
    sp = models["speech_predictor"]
    seed = jnp.float32(0.0)
    out = {}

    def report(name, per):
        out[name] = round(per * 1000, 1)
        print(f"{name}: {per * 1000:.1f} ms", flush=True)

    # bf16 params like the mixed-precision trainer
    cast = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        params,
    )

    # 1. generator forward (bf16 params, like the step's gen phase)
    @jax.jit
    def gen_fwd(p, tick):
        pred = sp.apply(
            p, texts, lengths, align, pitch + tick * 1e-30, energy, voiced,
            style, pitch, rng=jax.random.PRNGKey(0),
        )
        return jnp.sum(pred.audio.astype(jnp.float32))

    report("gen_fwd", diff_bench(
        lambda t: gen_fwd(cast["speech_predictor"], t), seed))

    # 2. multi-res spectrogram of GT (the fp32 DSP island)
    @jax.jit
    def dsp(tick):
        feats = ms(audio + tick * 1e-30)
        return jnp.sum(feats.mel[0].astype(jnp.float32))

    report("multi_spec", diff_bench(dsp, seed))

    # 3. gen fwd + mel loss + GRAD wrt generator params (the gen phase
    #    core, minus adversarial terms)
    @jax.jit
    def gen_grad(p, tick):
        def loss(p):
            pred = sp.apply(
                p, texts, lengths, align, pitch + tick * 1e-30, energy,
                voiced, style, pitch, rng=jax.random.PRNGKey(0),
            )
            fp = ms(pred.audio)
            ft = ms(audio)
            return L.spectral_convergence_loss(ft.mel, fp.mel)

        g = jax.grad(loss)(p)
        return jnp.sum(
            jax.flatten_util.ravel_pytree(g)[0][:8].astype(jnp.float32)
        )

    report("gen_fwd_bwd_mel", diff_bench(
        lambda t: gen_grad(cast["speech_predictor"], t), seed))

    # 4. discriminator forwards
    feats = ms(audio)

    @jax.jit
    def mrd_fwd(p, tick):
        sc = models["mrd0"].apply(p, feats.fft_mag[0] + tick * 1e-30)
        return jnp.sum(jax.flatten_util.ravel_pytree(sc)[0][:8]
                       .astype(jnp.float32))

    report("mrd0_fwd", diff_bench(lambda t: mrd_fwd(cast["mrd0"], t), seed))

    @jax.jit
    def disc_fwd(p, tick):
        sc = models["disc"].apply(p, audio + tick * 1e-30)
        return jnp.sum(jax.flatten_util.ravel_pytree(sc)[0][:8]
                       .astype(jnp.float32))

    report("disc_fwd", diff_bench(lambda t: disc_fwd(cast["disc"], t), seed))

    # 5. the full production step (state donated, chained by state)
    state = create_train_state(params, mc.text_encoder.tokens + 1)
    cfg = Config()
    ctx = StepContext(
        models, mc, cfg.loss_weight.model_dump(), NormalizationStats(),
        stage_steps=10000, base_lr=1e-4, mixed_precision=True,
    )
    batch = Batch(audio, texts, lengths, pitch,
                  jnp.full((B, Ltxt), F // Ltxt, jnp.int32))
    step = jax.jit(make_acoustic_step(ctx), donate_argnums=(0,))
    holder = {"s": state}
    holder["s"], m = step(holder["s"], batch)
    _ = jax.device_get(m["mel"])

    def run(k):
        t0 = time.perf_counter()
        mm = None
        for _ in range(k):
            holder["s"], mm = step(holder["s"], batch)
        _ = jax.device_get(mm["mel"])
        return time.perf_counter() - t0

    t4 = min(run(4) for _ in range(REPEATS))
    t8 = min(run(8) for _ in range(REPEATS))
    report("full_step", max((t8 - t4) / 4, t8 / 8))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
