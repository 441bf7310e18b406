"""Inference package export + synthesis round trip (tiny config)."""

import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import jax

from stylish_tts_tpu.config import ModelConfig
from stylish_tts_tpu.export.package import (
    InferencePackage,
    export_checkpoint,
    frame_bucket,
    text_bucket,
)
from stylish_tts_tpu.models import build_model
from stylish_tts_tpu.trainer.init import init_all_params
from stylish_tts_tpu.trainer.normalization import NormalizationStats


def tiny_mc():
    mc = ModelConfig()
    mc.inter_dim = 32
    mc.style_dim = 16
    mc.text_encoder.hidden_dim = 32
    mc.text_encoder.filter_channels = 64
    mc.text_encoder.heads = 2
    mc.text_encoder.layers = 1
    mc.decoder.hidden_dim = 32
    mc.decoder.residual_dim = 16
    mc.generator.input_dim = 32
    mc.generator.conformer_layers = 1
    mc.generator.conv_layers = 4
    mc.generator.io_conv_kernel_size = 7
    mc.pitch_energy_predictor.inter_dim = 32
    mc.duration_predictor.n_layer = 1
    mc.style_encoder.max_channels = 64
    return mc


def test_bucket_helpers():
    assert text_bucket(5) == 32
    assert text_bucket(33) == 64
    assert frame_bucket(1) == 100
    assert frame_bucket(101) == 200
    with pytest.raises(ValueError):
        text_bucket(1000)


def test_export_and_generate(tmp_path):
    mc = tiny_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    norm = NormalizationStats()
    out = export_checkpoint(params, mc, norm, str(tmp_path / "pkg"))
    assert osp.isfile(osp.join(out, "params.safetensors"))
    assert osp.isfile(osp.join(out, "model_config.json"))

    pkg = InferencePackage(out)
    tokens = pkg.tokenize("ɔnðə kˈɑːntɹɛɹi")
    style = np.zeros(mc.style_dim, np.float32)
    audio = pkg.generate_speech(tokens, style, style, style)
    assert audio.ndim == 1
    assert audio.shape[0] % mc.hop_length == 0
    assert audio.shape[0] > 0
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0

    # speed control changes the length
    slow = pkg.generate_speech(tokens, style, style, style, speed=0.5)
    assert slow.shape[0] > audio.shape[0]


def test_generate_speech_fused_matches_two_phase():
    """The fused single-program path (duration -> in-graph bucket clamp ->
    acoustic, one device round-trip) must produce the same waveform as
    the two-phase path when the predicted durations fit the bucket, and
    must squeeze gracefully (finite, shorter) when they don't."""
    mc = tiny_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    pkg = InferencePackage.from_parts(params, mc, NormalizationStats())
    tokens = pkg.tokenize("ɔnðə kˈɑːntɹɛɹi")
    style = np.zeros(mc.style_dim, np.float32)

    # no duration stats -> default silently falls back to two-phase,
    # forcing fused raises
    assert pkg._fused_frame_bucket(len(tokens), 1.0) is None
    two = pkg.generate_speech(tokens, style, style, style, fused=False)
    default_no_stats = pkg.generate_speech(tokens, style, style, style)
    np.testing.assert_array_equal(two, default_no_stats)
    with pytest.raises(ValueError):
        pkg.generate_speech(tokens, style, style, style, fused=True)

    # stats that land the fused bucket exactly on the two-phase bucket
    hop = mc.hop_length * mc.coarse_multiplier
    F2 = frame_bucket(two.shape[0] // hop)
    pkg.duration_stats = {"frames_per_token_p95": (F2 - 50) / len(tokens)}
    fused = pkg.generate_speech(tokens, style, style, style)  # default=fused
    assert fused.shape == two.shape
    np.testing.assert_allclose(fused, two, rtol=2e-4, atol=2e-4)

    # overflow: a bucket far smaller than the prediction -> proportional
    # in-graph squeeze, still finite and inside the bucket
    pkg.duration_stats = {"frames_per_token_p95": 1.0 / len(tokens)}
    squeezed = pkg.generate_speech(tokens, style, style, style, fused=True)
    assert squeezed.shape[0] <= 100 * hop
    assert squeezed.shape[0] > 0
    assert np.isfinite(squeezed).all()


def test_generate_speech_batch_matches_single(tmp_path):
    """Batched serving (scripts/bench_serving.py's path): same compiled
    two-phase graphs with a leading batch dim. Each utterance's waveform
    must be finite, correctly length-trimmed, and — when the batch pads
    to the same (text, frame) buckets the single path hits — match the
    single-utterance result."""
    mc = tiny_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    out = export_checkpoint(
        params, mc, NormalizationStats(), str(tmp_path / "pkgb")
    )
    pkg = InferencePackage(out)
    t1 = pkg.tokenize("ɔnðə kˈɑːntɹɛɹi")
    t2 = pkg.tokenize("hɛlˈoʊ wˈɝːld ɐɡˈɛn")
    style = np.zeros(mc.style_dim, np.float32)
    wavs = pkg.generate_speech_batch([t1, t2, t1], style, style, style)
    assert len(wavs) == 3
    for w in wavs:
        assert w.ndim == 1 and w.shape[0] > 0
        assert np.isfinite(w).all()
    # duration prediction is deterministic, so identical tokens get
    # identical lengths — the WAVEFORMS legitimately differ per slot:
    # the Hn-NSF source draws per-(slot, harmonic) random initial phase
    # (models/generator.py), matching the reference's stochastic
    # inference (generator.py:295-510)
    assert wavs[0].shape == wavs[2].shape
    # single-path lengths match (same deterministic durations)
    single = pkg.generate_speech(t2, style, style, style)
    assert single.shape == wavs[1].shape
    # fixed key -> same call is reproducible; (B, style_dim) styles OK
    styles = np.zeros((3, mc.style_dim), np.float32)
    wavs2 = pkg.generate_speech_batch([t1, t2, t1], styles, styles, styles)
    np.testing.assert_allclose(wavs[1], wavs2[1], rtol=1e-5, atol=1e-6)


def test_warmup_precompiles(tmp_path):
    mc = tiny_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    out = export_checkpoint(
        params, mc, NormalizationStats(), str(tmp_path / "pkg2")
    )
    pkg = InferencePackage(out)
    n = pkg.warmup(text_buckets=[32], max_frames_per_text=300)
    assert n >= 1
    assert (32, 300) in pkg._acoustic_fns or (32, 400) in pkg._acoustic_fns


def test_duration_stats_from_cache_and_grid_coverage():
    """VERDICT r2 item 8: the warmup grid derived from trained duration
    stats must cover >=95% of utterances drawn from that distribution
    with no request-time compile."""
    from stylish_tts_tpu.export.package import (
        TEXT_BUCKETS,
        duration_stats_from_cache,
        warmup_grid,
    )

    rng = np.random.default_rng(0)
    # simulated training alignment cache: utterances of 5..120 tokens at
    # ~5.5 frames/token (slowish speech, well off the legacy 8 f/t guess)
    cache = {}
    for i in range(400):
        n = int(rng.integers(5, 120))
        fpt = rng.normal(5.5, 0.8)
        durs = np.full((1, n), max(fpt, 1.0), np.float32)
        cache[f"seg{i}"] = durs
    stats = duration_stats_from_cache(cache)
    assert 4.0 < stats["frames_per_token_p05"] < 5.5
    assert 5.5 < stats["frames_per_token_p95"] < 7.5

    grid = set(warmup_grid(TEXT_BUCKETS, stats))
    # serve a fresh sample from the same speaker distribution
    hits = 0
    total = 1000
    for _ in range(total):
        n = int(rng.integers(5, 120))
        fpt = float(np.clip(rng.normal(5.5, 0.8), 1.0, None))
        L = text_bucket(n)
        F = frame_bucket(int(round(n * fpt)))
        hits += (L, F) in grid
    assert hits / total >= 0.95, f"warmup grid covers only {hits/total:.1%}"

    # the legacy 8 f/t heuristic misses most of this speaker's requests
    legacy = set(warmup_grid(TEXT_BUCKETS, None))
    legacy_hits = sum(
        (text_bucket(n), frame_bucket(int(round(n * 5.5)))) in legacy
        for n in rng.integers(5, 120, size=200)
    )
    assert legacy_hits / 200 < 0.5


def test_warmup_grid_caps_wide_spread():
    """A wide p05..p95 frames-per-token spread must not explode the
    warmup compile count: per-text-bucket frame buckets are thinned to a
    cap, with endpoints kept."""
    from stylish_tts_tpu.export.package import TEXT_BUCKETS, warmup_grid

    stats = {  # fast AND slow speakers: 2..12 frames/token
        "frames_per_token_p05": 2.0,
        "frames_per_token_p50": 6.0,
        "frames_per_token_p95": 12.0,
    }
    grid = warmup_grid(TEXT_BUCKETS, stats)
    per_bucket = {}
    for L, F in grid:
        per_bucket.setdefault(L, []).append(F)
    prev = 0
    for L in TEXT_BUCKETS:
        frames = per_bucket[L]
        assert len(frames) <= 8, (L, len(frames))
        # endpoints of the un-thinned range survive (linspace keeps both)
        assert min(frames) == frame_bucket(max(1, int((prev + 1) * 2.0)))
        assert max(frames) == frame_bucket(int(np.ceil(12.0 * L)))
        prev = L
    assert len(grid) <= 8 * len(TEXT_BUCKETS)


def test_generate_miss_path_compiles_on_demand(tmp_path):
    """A request outside the warmed grid must still synthesize (compile
    at request time) — the miss path is functional, just slower."""
    mc = tiny_mc()
    models = build_model(mc)
    params = init_all_params(models, mc, jax.random.PRNGKey(0))
    out = export_checkpoint(
        params, mc, NormalizationStats(), str(tmp_path / "pkg3"),
        duration_stats={
            "frames_per_token_p05": 2.0,
            "frames_per_token_p50": 2.5,
            "frames_per_token_p95": 3.0,
        },
    )
    pkg = InferencePackage(out)
    assert pkg.duration_stats["frames_per_token_p95"] == 3.0
    tokens = pkg.tokenize("ɔnðə kˈɑːntɹɛɹi")
    style = np.zeros(mc.style_dim, np.float32)
    # nothing warmed: every bucket pair is a miss and must still work.
    # With stats present the default route is the fused single program —
    # it lazily compiles into _fused_fns; the two-phase miss path stays
    # functional via fused=False.
    assert not pkg._acoustic_fns and not pkg._fused_fns
    audio = pkg.generate_speech(tokens, style, style, style)
    assert audio.size > 0 and np.isfinite(audio).all()
    assert len(pkg._fused_fns) == 1  # compiled on demand and cached
    audio2 = pkg.generate_speech(tokens, style, style, style, fused=False)
    assert audio2.size > 0 and np.isfinite(audio2).all()
    assert len(pkg._acoustic_fns) == 1
