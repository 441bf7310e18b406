"""Shape/smoke tests for all 13 model modules (tiny config, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stylish_tts_tpu.config import ModelConfig
from stylish_tts_tpu.models import build_model, MODEL_NAMES


@pytest.fixture(scope="module")
def tiny_config():
    mc = ModelConfig()
    mc.n_fft = 128  # head: fft 16, hidden 8
    mc.win_length = 128
    mc.hop_length = 60  # hop/scalehop must be int: 60/75 <1 → adjust scale inside?
    return mc


def small_model_config():
    mc = ModelConfig()
    # Keep the real generator geometry (scale=8, scalehop=75, up 3*5*5=75)
    # but shrink every width/depth.
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


MC = small_model_config()
B, T_TEXT, FRAMES = 2, 12, 40
SAMPLES = FRAMES * MC.hop_length


@pytest.fixture(scope="module")
def models():
    return build_model(MC)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def _texts():
    texts = jnp.asarray(np.random.default_rng(0).integers(1, 170, (B, T_TEXT)))
    lengths = jnp.asarray([T_TEXT, T_TEXT - 3])
    return texts, lengths


def _alignment():
    a = np.zeros((B, T_TEXT, FRAMES), np.float32)
    per = FRAMES // T_TEXT
    for i in range(T_TEXT):
        a[:, i, i * per : (i + 1) * per] = 1.0
    a[:, -1, T_TEXT * per :] = 1.0
    return jnp.asarray(a)


def test_model_registry_complete(models):
    assert sorted(models.keys()) == sorted(MODEL_NAMES)
    assert len(models) == 13


def test_text_aligner(models, rng):
    mel = jnp.asarray(np.random.randn(B, FRAMES, 80).astype(np.float32))
    lengths = jnp.asarray([FRAMES, FRAMES - 5])
    params = models["text_aligner"].init(rng, mel, lengths)
    out = models["text_aligner"].apply(params, mel, lengths)
    assert out.shape == (B, FRAMES, 179)
    # log-probs normalize
    np.testing.assert_allclose(
        np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-4
    )


def test_speech_predictor_end_to_end(models, rng):
    texts, lengths = _texts()
    align = _alignment()
    pitch = jnp.full((B, FRAMES), 120.0)
    energy = jnp.zeros((B, FRAMES))
    voiced = jnp.ones((B, FRAMES))
    style = jnp.zeros((B, MC.style_dim))
    params = models["speech_predictor"].init(
        {"params": rng}, texts, lengths, align, pitch, energy, voiced, style,
        pitch, rng=rng,
    )
    pred = models["speech_predictor"].apply(
        params, texts, lengths, align, pitch, energy, voiced, style, pitch,
        rng=rng,
    )
    assert pred.audio.shape == (B, SAMPLES)
    audio = np.asarray(pred.audio)
    assert np.isfinite(audio).all()
    assert np.abs(audio).max() <= 1.0


def test_style_encoders(models, rng):
    style_mel = jnp.asarray(np.random.randn(B, 80, FRAMES).astype(np.float32))
    pitch = jnp.full((B, FRAMES), 100.0)
    energy = jnp.zeros((B, FRAMES))
    p1 = models["speech_style_encoder"].init(rng, style_mel)
    s1 = models["speech_style_encoder"].apply(p1, style_mel)
    assert s1.shape == (B, MC.style_dim)
    p2 = models["pe_style_encoder"].init(rng, style_mel, pitch, energy)
    s2 = models["pe_style_encoder"].apply(p2, style_mel, pitch, energy)
    assert s2.shape == (B, MC.style_dim)
    p3 = models["duration_style_encoder"].init(rng, style_mel)
    s3 = models["duration_style_encoder"].apply(p3, style_mel)
    assert s3.shape == (B, MC.style_dim)


def test_duration_predictor(models, rng):
    texts, lengths = _texts()
    style = jnp.zeros((B, MC.style_dim))
    params = models["duration_predictor"].init(rng, texts, lengths, style)
    out = models["duration_predictor"].apply(params, texts, lengths, style)
    assert out.shape == (B, T_TEXT, MC.duration_predictor.duration_classes)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    # all logits are non-positive (-|cumsum| ordinal construction) and
    # masked positions are exactly zero
    assert (o <= 1e-6).all()
    assert np.abs(o[1, T_TEXT - 3 :]).max() == 0.0


def test_pitch_energy_predictor(models, rng):
    texts, lengths = _texts()
    align = _alignment()
    style = jnp.zeros((B, MC.style_dim))
    params = models["pitch_energy_predictor"].init(rng, texts, lengths, align, style)
    f0, n = models["pitch_energy_predictor"].apply(
        params, texts, lengths, align, style
    )
    assert f0.shape == (B, FRAMES) and n.shape == (B, FRAMES)


def test_discriminators(models, rng):
    audio = jnp.asarray(np.random.randn(B, SAMPLES).astype(np.float32) * 0.2)
    spec = jnp.asarray(np.random.rand(B, 1, 64, 30).astype(np.float32))
    pd_in = jnp.asarray(np.random.randn(B, 2, FRAMES).astype(np.float32))
    dd_in = jnp.asarray(np.random.randn(B, 1, T_TEXT).astype(np.float32))

    p = models["mrd0"].init(rng, spec)
    outs = models["mrd0"].apply(p, spec)
    assert len(outs) == 5 and all(o.shape[0] == B for o in outs)

    p = models["disc"].init(rng, audio)
    outs = models["disc"].apply(p, audio)
    assert len(outs) == 1 and outs[0].shape[0] == B

    p = models["pitch_disc"].init(rng, pd_in)
    outs = models["pitch_disc"].apply(p, pd_in)
    assert len(outs) == 5

    p = models["dur_disc"].init(rng, dd_in)
    outs = models["dur_disc"].apply(p, dd_in)
    assert len(outs) == 5


def test_sine_source_harmonic_frequency():
    from stylish_tts_tpu.models.generator import SineSource

    src = SineSource(sample_rate=24000, hop_length=300)
    f0 = jnp.full((1, 80), 200.0)  # 1 s at 200 Hz
    params = src.init(jax.random.PRNGKey(0), f0, jax.random.PRNGKey(1))
    sig = np.asarray(src.apply(params, f0, jax.random.PRNGKey(1)))[0]
    assert sig.shape[0] == 80 * 300
    spec = np.abs(np.fft.rfft(sig[2000:22000]))
    freqs = np.fft.rfftfreq(20000, 1 / 24000)
    peak = freqs[spec.argmax()]
    # energy must sit on a harmonic of the fundamental
    assert min(peak % 200.0, 200.0 - peak % 200.0) < 5.0


def test_multi_period_discriminator():
    from stylish_tts_tpu.models.discriminators import MultiPeriodDiscriminator

    mpd = MultiPeriodDiscriminator()
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6000)).astype(np.float32)
    )
    params = mpd.init(jax.random.PRNGKey(0), audio)
    scores, fmaps = mpd.apply(params, audio)
    assert scores.shape[0] == 2 and scores.shape[1] > 0
    assert len(fmaps) == 5 * 6


def test_generator_scan_stacks_equivalence():
    """generator.scan_stacks rolls the identical amp/phase ConvNeXt
    stacks with lax.scan (one compiled body, ~conv_layers-fold smaller
    HLO). With the unrolled params restacked along a leading axis the
    two layouts must produce the same audio bit-for-tolerance."""
    mc = small_model_config()
    models_u = build_model(mc)
    mc2 = small_model_config()
    mc2.generator.scan_stacks = True
    models_s = build_model(mc2)

    texts, lengths = _texts()
    align = _alignment()
    pitch = jnp.full((B, FRAMES), 120.0)
    energy = jnp.zeros((B, FRAMES))
    voiced = jnp.ones((B, FRAMES))
    style = jnp.zeros((B, mc.style_dim))
    rng = jax.random.PRNGKey(0)
    args = (texts, lengths, align, pitch, energy, voiced, style, pitch)
    p_u = models_u["speech_predictor"].init({"params": rng}, *args, rng=rng)

    # restack the unrolled per-layer trees along a new leading axis
    import re as _re

    gen_u = p_u["params"]["generator"]["basegen"]
    gen_s = dict(gen_u)
    for stack, scan_name in (
        ("amp_convnext", "amp_convnext_scan"),
        ("phase_convnext", "phase_convnext_scan"),
    ):
        names = sorted(
            (k for k in gen_u if _re.fullmatch(rf"{stack}_\d+", k)),
            key=lambda k: int(k.rsplit("_", 1)[1]),
        )
        assert names, list(gen_u)
        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves), *[gen_u[n] for n in names]
        )
        for n in names:
            gen_s.pop(n)
        gen_s[scan_name] = {"block": stacked}
    p_s = jax.tree.map(lambda x: x, p_u)  # shallow-copy the dict tree
    p_s["params"] = dict(p_s["params"])
    p_s["params"]["generator"] = dict(p_s["params"]["generator"])
    p_s["params"]["generator"]["basegen"] = gen_s

    out_u = models_u["speech_predictor"].apply(p_u, *args, rng=rng)
    out_s = models_s["speech_predictor"].apply(p_s, *args, rng=rng)
    np.testing.assert_allclose(
        np.asarray(out_s.audio), np.asarray(out_u.audio),
        rtol=2e-5, atol=2e-5,
    )


def test_ringformer_generator_variant():
    mc = small_model_config()
    mc.generator.type = "ringformer"
    mc.generator.upsample_initial_channel = 64
    mc.generator.upsample_rates = [4, 5]
    mc.generator.gen_istft_n_fft = 60
    mc.generator.gen_istft_hop_size = 15
    models = build_model(mc)
    texts, lengths = _texts()
    align = _alignment()
    pitch = jnp.full((B, FRAMES), 120.0)
    energy = jnp.zeros((B, FRAMES))
    voiced = jnp.ones((B, FRAMES))
    style = jnp.zeros((B, mc.style_dim))
    rng = jax.random.PRNGKey(0)
    params = models["speech_predictor"].init(
        {"params": rng}, texts, lengths, align, pitch, energy, voiced, style,
        pitch, rng=rng,
    )
    pred = models["speech_predictor"].apply(
        params, texts, lengths, align, pitch, energy, voiced, style, pitch,
        rng=rng,
    )
    assert pred.audio.shape == (B, FRAMES * 300)
    assert pred.magnitude is not None and pred.phase is not None
    assert np.isfinite(np.asarray(pred.audio)).all()
