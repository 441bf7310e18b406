"""Benchmark: flagship vocoder-path inference RTF on one TPU chip,
plus the acoustic G+D training-step time (driver-captured training perf).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}.
Baseline target (BASELINE.md): RTF <= 0.02 per v5e chip;
vs_baseline = 0.02 / measured_rtf (>1 means better than target).

Measurement protocol (VERDICT r2 item 6 + r3 item 1):
  * every timing is min/median over REPEATS x ITERS batches — a single
    mean hid the r1->r2 RTF drift (tunnel noise vs real regression);
  * the training step is benchmarked with state donation
    (donate_argnums=(0,)), the production configuration
    (trainer/loop.py jit_data_parallel_step donate_state=True);
  * MFU is computed from an ANALYTIC matmul+conv FLOP count of the
    exact step being timed (utils/flops.py) — NOT from XLA cost
    analysis, which statically sums every `lax.switch` branch and remat
    recompute and produced the physically impossible 1.09 MFU of round
    3. The analytic counter handles `lax.switch` as the branch mean and
    lhs-dilated (transposed) convs as their real tap count — counting
    those dense overstated the step 4x (the iSTFT overlap-add gradient
    is a conv with K=n_fft, lhs_dilation=hop). The XLA number is still
    reported, clearly labelled, for round-over-round comparability.
    The analytic count excludes elementwise/FFT work, so the MFU it
    yields is a principled underestimate; any value >= SUSPECT_MFU is
    flagged and >= 1.0 is reported as a measurement error instead of a
    result.
  * a large-matmul chip-speed canary runs alongside every bench: the
    axon tunnel's effective speed drifts between sessions (the same
    step binary measured 21 ms one day, 36 ms another), so step-time
    deltas across rounds are only meaningful relative to that day's
    canary TFLOP/s.
"""

from __future__ import annotations

import json
import os
import sys
import time

from stylish_tts_tpu.utils.jax_cache import setup_persistent_cache

V5E_BF16_PEAK_FLOPS = 197e12  # per chip (jax-ml.github.io/scaling-book)
SUSPECT_MFU = 0.9
REPEATS = 3

setup_persistent_cache(warn_stderr=True)


def _time_min_median(run_iters, repeats=REPEATS):
    vals = [run_iters() for _ in range(repeats)]
    vals.sort()
    return vals[0], vals[len(vals) // 2]


def bench_canary(n: int = 4096, iters: int = 20):
    """Chip-speed canary: one large bf16 matmul chain, achieved TFLOP/s.

    Round 3 -> round 4 showed the same step code measuring 21 ms one day
    and 36 ms another on "the same" chip — the axon tunnel's effective
    dispatch/device speed drifts between sessions. Every bench now
    records this canary so cross-round step-time comparisons can be
    normalized by actual chip speed that day instead of guessed at.
    A healthy v5e sustains ~85-95% of the 197 TFLOP/s bf16 peak on this
    shape; a canary far below that means the *environment*, not the
    code, regressed.
    """
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        # 8 dependent matmuls per call to amortize dispatch
        for _ in range(8):
            a = (a @ b) * (1.0 / n)
        return a

    chain(a, b).block_until_ready()

    def run_iters():
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = chain(a, b)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters

    dt_min, dt_med = _time_min_median(run_iters)
    flops_per_call = 8 * 2.0 * n * n * n
    return {
        "canary_bf16_tflops": round(flops_per_call / dt_min / 1e12, 1),
        "canary_bf16_tflops_median": round(flops_per_call / dt_med / 1e12, 1),
        "canary_mfu": round(flops_per_call / dt_min / V5E_BF16_PEAK_FLOPS, 3),
        "canary_shape": f"{n}x{n}x{n} bf16 x8-chain",
    }


def _mfu_fields(analytic_flops, xla_flops, dt_min, lower_bound):
    """MFU accounting that cannot print an impossible number."""
    out = {}
    if xla_flops:
        out["xla_cost_analysis_flops"] = xla_flops
        out["xla_flops_note"] = (
            "static HLO count: sums ALL lax.switch branches + remat "
            "recompute; NOT used for MFU"
        )
    if analytic_flops:
        achieved = analytic_flops / dt_min
        mfu = achieved / V5E_BF16_PEAK_FLOPS
        out["analytic_mxu_flops_per_step"] = analytic_flops
        out["achieved_mxu_tflops"] = round(achieved / 1e12, 2)
        if lower_bound:
            out["analytic_flops_note"] = "contains a while-loop counted once"
        if mfu >= 1.0:
            out["mfu_error"] = (
                f"computed MFU {mfu:.3f} >= 1.0 is physically impossible; "
                "treat this round's FLOP count or timing as broken"
            )
        else:
            out["mfu_vs_v5e_bf16_peak"] = round(mfu, 4)
            if mfu >= SUSPECT_MFU:
                out["mfu_suspect"] = True
    return out


def bench_train_step(batch: int = 16, frames: int = 240, iters: int = 10,
                     donate: bool = True, sampled_mrd: bool = True,
                     aot: bool = True, count_flops: bool = True):
    """Acoustic G+D step time on the full-size model (reference parity:
    /root/reference/src/stylish_tts/train/stage_type.py acoustic stage).

    donate/sampled_mrd/aot parametrize the measurement so regressions can
    be bisected between the production configuration (all True — what
    trainer/loop.py runs) and the round-2 bench configuration
    (donate=False, sampled_mrd=False, aot=False); see
    scripts/bisect_step_regression.py and PERF.md round 4.
    """
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
        sampled_mrd_only=sampled_mrd,
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

    step_fn = make_acoustic_step(ctx)
    donate_args = (0,) if donate else ()
    jitted = jax.jit(step_fn, donate_argnums=donate_args)
    xla_flops = None
    if aot:
        # lower+compile once, reuse the executable (a second jit-cache
        # compile through the remote-compile tunnel costs minutes)
        step = jitted.lower(state, data).compile()
        try:
            ca = step.cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            xla_flops = float(ca.get("flops", 0.0)) or None
        except Exception:
            pass
    else:
        step = jitted

    analytic = None
    lower_bound = False
    if count_flops:
        try:
            from stylish_tts_tpu.utils.flops import count_fn

            fc = count_fn(step_fn, state, data)
            analytic = fc.total
            lower_bound = fc.lower_bound
        except Exception as exc:
            print(f"warning: analytic FLOP count failed: {exc}",
                  file=sys.stderr)

    holder = {"state": state}
    holder["state"], metrics = step(holder["state"], data)
    jax.block_until_ready(metrics)

    def run_iters():
        t0 = time.perf_counter()
        m = None
        for _ in range(iters):
            holder["state"], m = step(holder["state"], data)
        jax.block_until_ready(m)
        return (time.perf_counter() - t0) / iters

    dt_min, dt_med = _time_min_median(run_iters)
    audio_sec = B * S / 24000
    out = {
        "acoustic_step_ms_min": round(dt_min * 1000, 2),
        "acoustic_step_ms_median": round(dt_med * 1000, 2),
        "audio_sec_per_wall_sec": round(audio_sec / dt_min, 1),
        "batch": B,
        "frames": F,
        "mixed_precision": True,
        "donated": donate,
        "sampled_mrd": sampled_mrd,
        "aot": aot,
        "repeats": REPEATS,
        "iters_per_repeat": iters,
    }
    out.update(_mfu_fields(analytic, xla_flops, dt_min, lower_bound))
    return out


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

    def run_iters():
        t0 = time.perf_counter()
        out = None
        for _ in range(n_iters):
            out = forward(*args)
        out.block_until_ready()
        return (time.perf_counter() - t0) / n_iters

    dt_min, dt_med = _time_min_median(run_iters)
    rtf = dt_min / (B * audio_seconds)
    rtf_median = dt_med / (B * audio_seconds)

    try:
        extra = bench_train_step()
    except Exception as exc:  # keep the primary metric even if training OOMs
        extra = {"train_step_error": f"{type(exc).__name__}: {exc}"[:300]}
    # B=32 is the measured per-chip training-throughput optimum (PERF.md
    # round 4 "Batch scaling past B=16"); record it alongside the B=16
    # bisect-comparable number. Opt out with STYLISH_BENCH_B32=0 (one
    # extra ~250 s compile on a cold persistent cache).
    if os.environ.get("STYLISH_BENCH_B32", "1") != "0":
        try:
            b32 = bench_train_step(batch=32, count_flops=False)
            for k in ("acoustic_step_ms_min", "acoustic_step_ms_median",
                      "audio_sec_per_wall_sec"):
                extra[f"b32_{k}"] = b32[k]
        except Exception as exc:
            extra["b32_error"] = f"{type(exc).__name__}: {exc}"[:200]
    try:
        extra.update(bench_canary())
    except Exception as exc:
        extra["canary_error"] = f"{type(exc).__name__}: {exc}"[:200]
    extra["rtf_median"] = round(rtf_median, 6)
    extra["rtf_repeats"] = REPEATS

    print(json.dumps({
        "metric": "vocoder_path_inference_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.02 / rtf, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    sys.exit(main())
