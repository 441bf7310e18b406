"""Batched serving benchmark through the packaged two-phase graph.

VERDICT r3 item 10: the headline RTF is measured at B=1; deployment
serves batches. This measures synthesis throughput at B=1/8/16 through
the EXACT production path (InferencePackage.generate_speech[_batch]:
duration graph -> frame bucket -> acoustic graph), full-size model,
random-init weights (timing only — the graphs are weight-agnostic).

Run on the chip: python scripts/bench_serving.py [B ...]
Appends one JSON line per batch size to /tmp/bench_serving.jsonl.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from stylish_tts_tpu.utils.jax_cache import setup_persistent_cache

setup_persistent_cache(warn_stderr=True)

REPEATS = 3
ITERS = 5


def main():
    import jax
    import numpy as np

    from stylish_tts_tpu.config import ModelConfig
    from stylish_tts_tpu.export.package import InferencePackage
    from stylish_tts_tpu.models import build_model
    from stylish_tts_tpu.trainer.init import init_all_params
    from stylish_tts_tpu.trainer.normalization import NormalizationStats

    batch_sizes = [int(a) for a in sys.argv[1:]] or [1, 8, 16]

    mc = ModelConfig()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    pkg = InferencePackage.from_parts(params, mc, NormalizationStats())

    rng = np.random.default_rng(0)
    n_tokens = 120  # ~a long sentence; text bucket 128
    style = np.zeros((mc.style_dim,), np.float32)

    out_path = "/tmp/bench_serving.jsonl"
    for b in batch_sizes:
        tokens = [
            rng.integers(1, 170, n_tokens).astype(np.int32) for _ in range(b)
        ]
        t0 = time.time()
        wavs = pkg.generate_speech_batch(tokens, style, style, style)
        compile_wall = time.time() - t0
        audio_sec = sum(w.shape[0] for w in wavs) / mc.sample_rate

        def run_iters():
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = pkg.generate_speech_batch(tokens, style, style, style)
            # generate_speech_batch materializes numpy — already synced
            return (time.perf_counter() - t0) / ITERS

        vals = sorted(run_iters() for _ in range(REPEATS))
        dt_min, dt_med = vals[0], vals[len(vals) // 2]
        res = {
            "batch": b,
            "tokens_per_utt": n_tokens,
            "audio_sec_per_call": round(audio_sec, 2),
            "wall_ms_min": round(dt_min * 1000, 1),
            "wall_ms_median": round(dt_med * 1000, 1),
            "rtf": round(dt_min / audio_sec, 6),
            "audio_sec_per_wall_sec": round(audio_sec / dt_min, 1),
            "first_call_wall_s": round(compile_wall, 1),
            "repeats": REPEATS,
            "iters": ITERS,
        }
        line = json.dumps(res)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")

    # ---- fused single-program path at B=1 (VERDICT r4 item 5) ----------
    # One compiled program per request (duration -> in-graph clamp ->
    # acoustic): removes the second tunnel round-trip the two-phase B=1
    # path pays. Duration stats are derived from a two-phase probe so the
    # fused bucket matches what real stats would pick.
    from stylish_tts_tpu.export.package import frame_bucket

    tokens1 = rng.integers(1, 170, n_tokens).astype(np.int32)
    probe = pkg.generate_speech(tokens1, style, style, style, fused=False)
    hop = mc.hop_length * mc.coarse_multiplier
    f2 = frame_bucket(probe.shape[0] // hop)
    pkg.duration_stats = {"frames_per_token_p95": (f2 - 50) / n_tokens}

    t0 = time.time()
    wav = pkg.generate_speech(tokens1, style, style, style, fused=True)
    compile_wall = time.time() - t0
    audio_sec = wav.shape[0] / mc.sample_rate

    def run_fused():
        t0 = time.perf_counter()
        for _ in range(ITERS):
            pkg.generate_speech(tokens1, style, style, style, fused=True)
        return (time.perf_counter() - t0) / ITERS

    vals = sorted(run_fused() for _ in range(REPEATS))
    dt_min, dt_med = vals[0], vals[len(vals) // 2]
    res = {
        "batch": 1,
        "mode": "fused",
        "tokens_per_utt": n_tokens,
        "audio_sec_per_call": round(audio_sec, 2),
        "wall_ms_min": round(dt_min * 1000, 1),
        "wall_ms_median": round(dt_med * 1000, 1),
        "rtf": round(dt_min / audio_sec, 6),
        "audio_sec_per_wall_sec": round(audio_sec / dt_min, 1),
        "first_call_wall_s": round(compile_wall, 1),
        "repeats": REPEATS,
        "iters": ITERS,
    }
    line = json.dumps(res)
    print(line, flush=True)
    with open(out_path, "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
