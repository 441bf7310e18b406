"""Benchmark: flagship vocoder-path inference RTF on one TPU chip,
plus the acoustic G+D training-step time (driver-captured training perf).

Prints the JSON line {"metric", "value", "unit", "vs_baseline", "extra"}
immediately after the primary (inference) phase, then RE-prints the full
line after each later phase completes — the last complete line is the
result, and a timeout mid-bench loses only the unfinished extras, never
the metric (round-4 lesson: the all-at-the-end print timed out and the
round recorded nothing). Whole-run wall budget: STYLISH_BENCH_BUDGET
seconds (default 1100); later phases are skipped with a note once spent.
Baseline target (BASELINE.md): RTF <= 0.02 per v5e chip;
vs_baseline = 0.02 / measured_rtf (>1 means better than target).

Measurement protocol (VERDICT r2 item 6 + r3 item 1, REBUILT round 5):
  * `.block_until_ready()` is a NO-OP through the axon tunnel and
    execution is lazy (scripts/probe_axon_timing.py) — every timing now
    data-chains its calls, forces them with a scalar value fetch, and
    differences two chain lengths so the constant fetch round-trip
    cancels (_diff_time). The r1-r4 async-timed RTF/MFU numbers were
    dispatch overhead, not chip time; round-5 numbers are NOT
    comparable to them (they are honest, and much larger).
  * each chain-length timing is min over REPEATS runs;
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


def _diff_time(run_n, n_small: int, n_big: int, repeats=REPEATS):
    """Differential per-call timing: (T(n_big) - T(n_small)) / delta.

    Round-5 probe (scripts/probe_axon_timing.py): through the axon
    tunnel `.block_until_ready()` is a NO-OP and execution is LAZY —
    enqueued computations only run when a value is actually fetched.
    Every async-timed number bench.py printed in rounds 1-4 (RTF 6e-5,
    the "impossible" MFU) was Python dispatch overhead, not chip time.
    The honest protocol is: chain N data-dependent calls, fetch a
    scalar output (forcing the whole chain), and difference two chain
    lengths so the constant fetch round-trip cancels. run_n(n) must
    return the wall seconds for a chain of n calls ending in a fetch.

    Returns (per_call_s, t_small_min, t_big_min); falls back to
    t_big/n_big if noise makes the difference non-positive.
    """
    t_small = min(run_n(n_small) for _ in range(repeats))
    t_big = min(run_n(n_big) for _ in range(repeats))
    per = (t_big - t_small) / (n_big - n_small)
    if per <= 0:
        per = t_big / n_big
    return per, t_small, t_big


def bench_canary(n: int = 4096, iters: int = 24):
    """Chip-speed canary: one large bf16 matmul chain, achieved TFLOP/s.

    Round 3 -> round 4 showed the same step code measuring 21 ms one day
    and 36 ms another on "the same" chip — the axon tunnel's effective
    dispatch/device speed drifts between sessions. Every bench records
    this canary so cross-round step-time comparisons can be normalized
    by actual chip speed that day. A healthy v5e sustains ~85-95% of the
    197 TFLOP/s bf16 peak on this shape; far below that means the
    *environment*, not the code, regressed.

    Timing protocol: calls are DATA-CHAINED (each output feeds the next
    input) and the chain is forced by fetching a scalar summary; the
    per-call time comes from differencing two chain lengths
    (see _diff_time — block_until_ready is a no-op on this tunnel).
    """
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        # 8 dependent matmuls per call
        for _ in range(8):
            a = (a @ b) * (1.0 / n)
        # tiny scalar summary: fetching it forces the chain at the cost
        # of a 4-byte transfer instead of the 32 MB matrix
        return a, jnp.sum(a[:8, :8].astype(jnp.float32))

    x, s = chain(a, b)
    _ = jax.device_get(s)  # compile + first execute

    def run_n(k):
        t0 = time.perf_counter()
        x = a
        s = None
        for _ in range(k):
            x, s = chain(x, b)
        _ = jax.device_get(s)
        return time.perf_counter() - t0

    per, t_small, t_big = _diff_time(run_n, iters // 2, iters)
    flops_per_call = 8 * 2.0 * n * n * n
    return {
        "canary_bf16_tflops": round(flops_per_call / per / 1e12, 1),
        "canary_mfu": round(flops_per_call / per / V5E_BF16_PEAK_FLOPS, 3),
        "canary_ms_per_call": round(per * 1000, 3),
        "canary_fetch_wall_s": [round(t_small, 3), round(t_big, 3)],
        "canary_shape": f"{n}x{n}x{n} bf16 x8-chain, diff {iters//2}->{iters}",
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
    _ = jax.device_get(metrics["mel"])  # force compile + first execute

    # steps chain naturally through the (donated) state; fetching one
    # scalar metric forces the whole chain (lazy tunnel execution — see
    # _diff_time)
    def run_n(k):
        t0 = time.perf_counter()
        m = None
        for _ in range(k):
            holder["state"], m = step(holder["state"], data)
        _ = jax.device_get(m["mel"])
        return time.perf_counter() - t0

    per, t_small, t_big = _diff_time(run_n, iters, 2 * iters)
    audio_sec = B * S / 24000
    out = {
        "acoustic_step_ms": round(per * 1000, 2),
        "audio_sec_per_wall_sec": round(audio_sec / per, 1),
        "batch": B,
        "frames": F,
        "mixed_precision": True,
        "donated": donate,
        "sampled_mrd": sampled_mrd,
        "aot": aot,
        "repeats": REPEATS,
        "diff_iters": [iters, 2 * iters],
        "fetch_wall_s": [round(t_small, 3), round(t_big, 3)],
    }
    out.update(_mfu_fields(analytic, xla_flops, per, lower_bound))
    return out


def _emit(result):
    """Print the FULL result JSON line and flush.

    Called after every completed phase with a strict superset of the
    previous line: the driver keeps the output tail and parses the last
    complete JSON line, so if a later phase times out, the most recent
    finished snapshot still counts (round-4 failure mode: one line at
    the very end -> rc=124 -> NO metric recorded at all).
    """
    print(json.dumps(result), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.ops import DurationProcessor

    # Wall-clock budget for the whole bench (seconds). Phases run in
    # decreasing order of importance (inference RTF -> canary -> train
    # step+MFU -> optional B=32) and each later phase is skipped, with a
    # note, once the budget is spent — a partial bench that prints is
    # worth infinitely more than a complete one that times out.
    budget_s = float(os.environ.get("STYLISH_BENCH_BUDGET", "1100"))
    t_bench0 = time.time()

    def over_budget():
        return time.time() - t_bench0 > budget_s

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
        audio = sp.apply(
            params, texts, lengths, align, pitch, energy, voiced, style,
            pitch, rng=jax.random.PRNGKey(0),
        ).audio
        # scalar summary: fetching it forces execution (lazy tunnel);
        # it also feeds the next call's style input to data-chain calls
        return audio, jnp.sum(audio.astype(jnp.float32))

    args = (params, texts, lengths, align, pitch, energy, voiced, style)
    # warmup/compile + force
    _, s0 = forward(*args)
    _ = jax.device_get(s0)

    # calls are data-chained through a numerically-negligible style
    # perturbation (prev audio sum * 1e-30) so the tunnel cannot
    # overlap/elide them; see _diff_time for why
    def run_n(k):
        t0 = time.perf_counter()
        s = s0
        for _ in range(k):
            _, s = forward(
                params, texts, lengths, align, pitch, energy, voiced,
                style + s * 1e-30,
            )
        _ = jax.device_get(s)
        return time.perf_counter() - t0

    per, t_small, t_big = _diff_time(run_n, 5, 15)
    rtf = per / (B * audio_seconds)

    extra = {
        "rtf_timing": "data-chained diff 5->15 calls, scalar fetch",
        "rtf_fetch_wall_s": [round(t_small, 3), round(t_big, 3)],
        "rtf_repeats": REPEATS,
    }
    result = {
        "metric": "vocoder_path_inference_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(0.02 / rtf, 3),
        "extra": extra,
    }
    _emit(result)  # primary metric is now on the record, whatever follows

    # canary first: cheap compile, and every later number is only
    # interpretable relative to this session's measured chip/tunnel speed
    if over_budget():
        extra["canary_skipped"] = "bench budget exhausted"
    else:
        try:
            extra.update(bench_canary())
        except Exception as exc:
            extra["canary_error"] = f"{type(exc).__name__}: {exc}"[:200]
        _emit(result)

    if over_budget():
        extra["train_step_skipped"] = "bench budget exhausted"
        _emit(result)
    else:
        try:
            extra.update(bench_train_step())
        except Exception as exc:  # keep the primary metric even if OOM
            extra["train_step_error"] = f"{type(exc).__name__}: {exc}"[:300]
        _emit(result)

    # B=32 is the measured per-chip training-throughput optimum (PERF.md
    # round 4 "Batch scaling past B=16") but costs an extra ~250 s
    # compile on a cold cache, so it is opt-*in* (STYLISH_BENCH_B32=1):
    # the driver's budgeted run records the round-comparable B=16 number.
    if os.environ.get("STYLISH_BENCH_B32", "0") == "1" and not over_budget():
        try:
            b32 = bench_train_step(batch=32, count_flops=False)
            for k in ("acoustic_step_ms", "audio_sec_per_wall_sec"):
                extra[f"b32_{k}"] = b32[k]
        except Exception as exc:
            extra["b32_error"] = f"{type(exc).__name__}: {exc}"[:200]
        _emit(result)
    extra["bench_wall_s"] = round(time.time() - t_bench0, 1)
    _emit(result)


if __name__ == "__main__":
    sys.exit(main())
