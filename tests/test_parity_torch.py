"""Golden weight-port parity vs the live torch reference models.

For every module: build the torch reference at a small config, fold its
parametrizations (weight norm / spectral norm / BatchNorm eval) with
convert.folding, map the weights onto the flax module with
convert.torch_import, and assert forward agreement on the same inputs.

These tests are the gateway to the BASELINE "mel-L1 / waveform parity"
target: they prove the flax modules compute the same functions as the
reference given the same weights (VERDICT.md round-1 item 2).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stylish_tts_tpu.convert import fold_state_dict, torch_import as ti  # noqa: E402

from ref_loader import ref_module  # noqa: E402


_RECORDED: dict = {}


def max_rel(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    err = float(np.abs(a - b).max() / scale)
    import os, inspect  # record per-test worst error for PARITY.md

    test = next((f.function for f in inspect.stack()
                 if f.function.startswith("test_")), "?")
    _RECORDED[test] = max(err, _RECORDED.get(test, 0.0))
    if os.environ.get("PARITY_REPORT"):
        import json
        with open(os.environ["PARITY_REPORT"], "w") as fh:
            json.dump(_RECORDED, fh, indent=1, sort_keys=True)
    return err


def run_torch(mod, *args):
    mod.eval()
    with torch.no_grad():
        out = mod(*args)
    return out


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(0)
    np.random.seed(0)


# ------------------------------------------------------------- style encoders


def test_mel_style_encoder_parity():
    ref = ref_module("mel_style_encoder")
    tm = ref.MelStyleEncoder(dim_in=8, style_dim=12, max_conv_dim=32,
                             skip_downsamples=True)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": {"core": ti.convert_mel_style_encoder(sd)["core"]}}

    from stylish_tts_tpu.models.style_encoder import MelStyleEncoder

    fm = MelStyleEncoder(dim_in=8, style_dim=12, max_conv_dim=32,
                         skip_last_downsample=True, sn=False)
    x = np.random.randn(2, 40, 37).astype(np.float32)  # odd frames on purpose
    want = run_torch(tm, torch.from_numpy(x)[:, None]).numpy()
    got = fm.apply(params, jnp.asarray(x))
    assert max_rel(got, want) < 1e-4, max_rel(got, want)


def test_pitch_style_encoder_parity():
    ref = ref_module("mel_style_encoder")
    tm = ref.PitchStyleEncoder(dim_in=40, style_dim=12, max_conv_dim=64,
                               skip_downsamples=True, coarse_multiplier=2)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_pitch_style_encoder(sd)}

    from stylish_tts_tpu.models.style_encoder import PitchStyleEncoder

    fm = PitchStyleEncoder(dim_in=40, style_dim=12, max_conv_dim=64,
                           skip_last_downsample=True, coarse_multiplier=2,
                           sn=False)
    frames = 80
    mel = np.random.randn(2, 40, frames // 2).astype(np.float32)
    pitch = np.abs(np.random.randn(2, frames)).astype(np.float32) * 100
    energy = np.random.randn(2, frames).astype(np.float32)
    want = run_torch(
        tm, torch.from_numpy(mel), torch.from_numpy(pitch),
        torch.from_numpy(energy),
    ).numpy()
    got = fm.apply(
        params, jnp.asarray(mel), jnp.asarray(pitch), jnp.asarray(energy)
    )
    assert max_rel(got, want) < 1e-4, max_rel(got, want)


# ------------------------------------------------------------- discriminators


def test_spec_discriminator_parity():
    ref = ref_module("discriminator")
    tm = ref.SpecDiscriminator()
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_spec_discriminator(sd)}

    from stylish_tts_tpu.models.discriminators import SpecDiscriminator

    fm = SpecDiscriminator()
    x = np.random.randn(2, 1, 22, 43).astype(np.float32)  # odd frames
    want, _ = run_torch(tm, torch.from_numpy(x))
    got = fm.apply(params, jnp.asarray(x))
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        assert g.shape == tuple(w.shape)
        assert max_rel(g, w.numpy()) < 1e-4


def test_context_free_discriminator_parity():
    ref = ref_module("discriminator")
    tm = ref.ContextFreeDiscriminator()
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_context_free_discriminator(sd)}

    from stylish_tts_tpu.models.discriminators import ContextFreeDiscriminator

    fm = ContextFreeDiscriminator(norm_mode="affine")
    x = np.random.randn(2, 1024 * 3 + 512).astype(np.float32)
    want, _ = run_torch(tm, torch.from_numpy(x))
    got = fm.apply(params, jnp.asarray(x))
    assert got[0].shape == tuple(want[0].shape)
    assert max_rel(got[0], want[0].numpy()) < 1e-4


def test_pitch_discriminator_parity():
    ref = ref_module("pitch_discriminator")
    tm = ref.PitchDiscriminator(dim_in=2, dim_hidden=16, kernel=21)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_pitch_discriminator(sd)}

    from stylish_tts_tpu.models.discriminators import PitchDiscriminator

    fm = PitchDiscriminator(dim_hidden=16, kernel=21)
    x = np.random.randn(2, 2, 50).astype(np.float32)
    want, _ = run_torch(tm, torch.from_numpy(x))
    got = fm.apply(params, jnp.asarray(x))
    for g, w in zip(got, want):
        assert max_rel(g, w.numpy()) < 1e-4


# ----------------------------------------------------------------- aligner


def test_text_aligner_parity():
    ref = ref_module("text_aligner")
    tm = ref.tdnn_blstm_ctc_model_base(10, 17)
    # give BatchNorm non-trivial running stats
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_text_aligner(sd)}

    from stylish_tts_tpu.models.text_aligner import TextAligner

    fm = TextAligner(n_mels=10, n_tokens=17, hidden_dim=640,
                     norm_mode="affine")
    B, T = 2, 23
    x = np.random.randn(B, T, 10).astype(np.float32)
    lengths = np.array([23, 17], np.int64)
    want, _ = run_torch(tm, torch.from_numpy(x), torch.from_numpy(lengths))
    # reference ctc_output permutes to (T, N, C)
    want = want.permute(1, 0, 2).numpy()
    got = np.asarray(fm.apply(params, jnp.asarray(x), jnp.asarray(lengths)))
    # compare only within valid lengths (the reference masks before convs
    # identically, but keep it strict anyway)
    for b, L in enumerate(lengths):
        assert max_rel(got[b, :L], want[b, :L]) < 1e-4


# ------------------------------------------------------------ text encoder


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _text_cfgs():
    """Small matched (torch namespace, flax TextEncoderConfig) pair."""
    from stylish_tts_tpu.config import TextEncoderConfig

    kw = dict(tokens=20, hidden_dim=16, filter_channels=32, heads=2,
              layers=2, kernel_size=3, dropout=0.0)
    return _NS(**kw), TextEncoderConfig(**kw)


def _text_inputs(B=2, L=9):
    texts = np.random.randint(1, 20, (B, L)).astype(np.int64)
    lengths = np.array([L, L - 3], np.int64)
    return texts, lengths


def test_text_encoder_parity():
    ref = ref_module("text_encoder")
    tcfg, fcfg = _text_cfgs()
    tm = ref.TextEncoder(inter_dim=12, config=tcfg)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_text_encoder(sd, n_layers=tcfg.layers)}

    from stylish_tts_tpu.models.text_encoder import TextEncoder

    fm = TextEncoder(inter_dim=12, config=fcfg)
    texts, lengths = _text_inputs()
    mu_t, hid_t, _ = run_torch(
        tm, torch.from_numpy(texts), torch.from_numpy(lengths)
    )
    mu, hid, _ = fm.apply(
        params, jnp.asarray(texts), jnp.asarray(lengths)
    )
    # reference returns channels-first (B, C, T)
    assert max_rel(mu, mu_t.numpy().transpose(0, 2, 1)) < 1e-4
    assert max_rel(hid, hid_t.numpy().transpose(0, 2, 1)) < 1e-4


# ----------------------------------------------------------------- decoder


def test_decoder_parity():
    ref = ref_module("decoder")
    tm = ref.Decoder(dim_in=12, style_dim=8, dim_out=10, hidden_dim=16,
                     residual_dim=6)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_decoder(sd)}

    from stylish_tts_tpu.models.decoder import Decoder

    fm = Decoder(dim_in=12, style_dim=8, hidden_dim=16, residual_dim=6)
    B, T = 2, 25
    asr = np.random.randn(B, 12, T).astype(np.float32)
    f0 = np.random.randn(B, T).astype(np.float32) * 50
    n = np.random.randn(B, T).astype(np.float32)
    v = (np.random.rand(B, T) > 0.3).astype(np.float32)
    style = np.random.randn(B, 8).astype(np.float32)
    want, _ = run_torch(
        tm, torch.from_numpy(asr), torch.from_numpy(f0), torch.from_numpy(n),
        torch.from_numpy(style), torch.from_numpy(v),
    )
    got, _ = fm.apply(
        params, jnp.asarray(asr.transpose(0, 2, 1)), jnp.asarray(f0),
        jnp.asarray(n), jnp.asarray(style), jnp.asarray(v),
    )
    assert max_rel(got, want.numpy().transpose(0, 2, 1)) < 1e-4


# --------------------------------------------------------------- conformer


def test_conformer_parity():
    ref = ref_module("conformer")
    tm = ref.Conformer(16, style_dim=8, depth=2, dim_head=8, heads=2,
                       conv_kernel_size=7)
    # non-trivial BatchNorm running stats
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    sd = fold_state_dict(tm.state_dict())
    params = {"params": {f"block_{i}": ti.conformer_block(sd, f"layers.{i}")
                         for i in range(2)}}

    from stylish_tts_tpu.models.conformer import Conformer

    fm = Conformer(dim=16, depth=2, dim_head=8, heads=2, conv_kernel_size=7,
                   norm_mode="affine")
    B, T = 2, 13
    x = np.random.randn(B, T, 16).astype(np.float32)
    style = np.random.randn(B, 8).astype(np.float32)
    lengths = np.array([13, 9], np.int64)
    want = run_torch(
        tm, torch.from_numpy(x), torch.from_numpy(style),
        torch.from_numpy(lengths),
    ).numpy()
    got = np.asarray(fm.apply(
        params, jnp.asarray(x), jnp.asarray(style), jnp.asarray(lengths)
    ))
    for b, L in enumerate(lengths):
        assert max_rel(got[b, :L], want[b, :L]) < 1e-4


# -------------------------------------------------- pitch/energy predictor


def test_pitch_energy_predictor_parity():
    ref = ref_module("pitch_energy_predictor")
    tcfg, fcfg = _text_cfgs()
    tm = ref.PitchEnergyPredictor(
        style_dim=8, inter_dim=16, text_config=tcfg,
        duration_config=None, pitch_energy_config=_NS(dropout=0.0),
    )
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_pitch_energy_predictor(sd, tcfg.layers)}

    from stylish_tts_tpu.config import PitchEnergyPredictorConfig
    from stylish_tts_tpu.models.pitch_energy_predictor import PitchEnergyPredictor

    fm = PitchEnergyPredictor(
        style_dim=8, inter_dim=16, text_config=fcfg, duration_config=None,
        pe_config=PitchEnergyPredictorConfig(inter_dim=16, dropout=0.0),
    )
    B, L, F = 2, 9, 20
    texts, lengths = _text_inputs(B, L)
    align = np.zeros((B, L, F), np.float32)
    for b in range(B):
        for f in range(F):
            align[b, min(f * L // F, L - 1), f] = 1.0
    style = np.random.randn(B, 8).astype(np.float32)
    f0_t, n_t = run_torch(
        tm, torch.from_numpy(texts), torch.from_numpy(lengths),
        torch.from_numpy(align), torch.from_numpy(style),
    )
    f0, n = fm.apply(
        params, jnp.asarray(texts), jnp.asarray(lengths), jnp.asarray(align),
        jnp.asarray(style),
    )
    assert max_rel(f0, f0_t.numpy()) < 1e-4
    assert max_rel(n, n_t.numpy()) < 1e-4


# ------------------------------------------------------ duration predictor


def test_duration_predictor_parity():
    ref = ref_module("duration_predictor")
    tcfg, fcfg = _text_cfgs()
    dur_t = _NS(n_layer=2, last_dropout=0.0, duration_classes=5, dropout=0.0,
                max_duration=50)
    # inter_dim=32 keeps cross-attention head_dim >= 4: at head_dim=2 the
    # reference RoPE degenerates (broadcasts the head dim 2->3), which no
    # real config hits (model.yml inter_dim=512 -> head_dim 64).
    tm = ref.DurationPredictor(
        style_dim=8, inter_dim=32, text_config=tcfg, duration_config=dur_t
    )
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_duration_predictor(sd, tcfg.layers, 2)}

    from stylish_tts_tpu.config import DurationPredictorConfig
    from stylish_tts_tpu.models.duration_predictor import DurationPredictor

    fm = DurationPredictor(
        style_dim=8, inter_dim=32, text_config=fcfg,
        duration_config=DurationPredictorConfig(
            n_layer=2, last_dropout=0.0, duration_classes=5, dropout=0.0
        ),
    )
    texts, lengths = _text_inputs()
    style = np.random.randn(2, 8).astype(np.float32)
    want = run_torch(
        tm, torch.from_numpy(texts), torch.from_numpy(lengths),
        torch.from_numpy(style),
    ).numpy()
    got = np.asarray(fm.apply(
        params, jnp.asarray(texts), jnp.asarray(lengths), jnp.asarray(style)
    ))
    assert max_rel(got, want) < 1e-4


# ---------------------------------------------------------- generator / DSP


def test_reference_conv_stft_parity():
    """My stft/istft in reference-convention mode vs the reference's
    export-safe conv STFT (reference stft.py)."""
    ref = ref_module("stft")
    from stylish_tts_tpu.dsp import stft as stft_lib

    tstft = ref.STFT(filter_length=16, hop_length=4, win_length=16)
    audio = np.random.randn(2, 400).astype(np.float32)
    with torch.no_grad():
        mag_t, x_t, y_t = tstft.transform(torch.from_numpy(audio))
    mag, x, y = stft_lib.stft_magnitude_unit_phase(
        jnp.asarray(audio), 16, 4, 16, center=True, pad_mode="edge"
    )
    assert max_rel(mag, mag_t.numpy()) < 1e-5
    assert max_rel(x, x_t.numpy()) < 1e-5

    spec = np.abs(np.random.randn(2, 9, 30)).astype(np.float32) + 0.1
    phase = np.random.uniform(-np.pi, np.pi, (2, 9, 30)).astype(np.float32)
    with torch.no_grad():
        want = tstft.inverse(
            torch.from_numpy(spec), torch.from_numpy(np.cos(phase)),
            torch.from_numpy(np.sin(phase)),
        ).numpy()[:, 0]
    got = stft_lib.istft(
        jnp.asarray(spec * np.cos(phase)), jnp.asarray(spec * np.sin(phase)),
        16, 4, 16, center=True, normalize_window=False, uniform_scale=True,
    )
    assert max_rel(got, want) < 1e-5


def test_sine_source_deterministic_parity():
    """Hn-NSF harmonic source, deterministic part (noise/init phase zeroed)."""
    ref = ref_module("generator")
    hop = 30
    tm = ref.SourceModuleHnNSF(
        sampling_rate=24000, upsample_scale=hop, harmonic_num=8,
        voiced_threshod=10,
    )
    tm.eval()
    sd = fold_state_dict(tm.state_dict())

    from stylish_tts_tpu.models.generator import SineSource

    fm = SineSource(sample_rate=24000, hop_length=hop, harmonic_num=8,
                    voiced_threshold=10.0, deterministic=True)
    params = {"params": {"merge": ti.dense(sd, "l_linear")}}

    B, F = 2, 16
    f0 = np.full((B, F), 220.0, np.float32)
    f0[1, :] = 147.0

    # zero the reference's stochastic parts
    orig_rand, orig_randn = torch.rand, torch.randn
    try:
        torch.rand = lambda *a, **k: orig_rand(*a, **k) * 0
        torch.randn = lambda *a, **k: orig_randn(*a, **k) * 0
        f0_up = torch.nn.functional.interpolate(
            torch.from_numpy(f0)[:, None], scale_factor=hop, mode="linear"
        ).transpose(1, 2)
        with torch.no_grad():
            want, _, _ = tm(f0_up, F)
        want = want.squeeze(2).numpy()
    finally:
        torch.rand, torch.randn = orig_rand, orig_randn

    got = np.asarray(fm.apply(params, jnp.asarray(f0), jax.random.PRNGKey(0)))
    # constant-F0 rows: integration paths agree up to interpolation detail
    assert max_rel(got, want) < 1e-3, max_rel(got, want)


def _gen_cfgs():
    from stylish_tts_tpu.config import GeneratorConfig

    kw = dict(input_dim=10, io_conv_kernel_size=3, conformer_layers=1,
              conv_layers=4)
    return _NS(**kw), GeneratorConfig(norm_mode="affine", **kw)


def test_multi_generator_parity():
    """Full flagship vocoder vs reference MultiGenerator, with the
    stochastic harmonic prior captured from the reference and injected."""
    ref = ref_module("generator")
    tcfg, fcfg = _gen_cfgs()
    tm = ref.MultiGenerator(style_dim=8, n_fft=64, win_length=64,
                            hop_length=300, sample_rate=24000, config=tcfg)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    tm.eval()
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_multi_generator(
        sd, conformer_layers=1, conv_layers=4
    )}

    captured = {}
    orig_forward = tm.basegen.m_source.forward

    def capture(x, source_len):
        out = orig_forward(x, source_len)
        captured["prior"] = out[0].squeeze(2).detach().numpy()
        return out

    tm.basegen.m_source.forward = capture

    from stylish_tts_tpu.models.generator import MultiGenerator

    fm = MultiGenerator(style_dim=8, n_fft=64, win_length=64, hop_length=300,
                        sample_rate=24000, config=fcfg)

    B, F = 2, 4
    mel = np.random.randn(B, 10, F).astype(np.float32)
    style = np.random.randn(B, 8).astype(np.float32)
    pitch = np.full((B, F), 220.0, np.float32)
    energy = np.random.randn(B, F).astype(np.float32)
    voiced = np.ones((B, F), np.float32)
    with torch.no_grad():
        want = tm(
            mel=torch.from_numpy(mel), style=torch.from_numpy(style),
            pitch=torch.from_numpy(pitch), energy=torch.from_numpy(energy),
            voiced=torch.from_numpy(voiced),
        ).audio.numpy()

    got = fm.apply(
        params,
        mel=jnp.asarray(mel.transpose(0, 2, 1)),
        style=jnp.asarray(style),
        pitch=jnp.asarray(pitch),
        energy=jnp.asarray(energy),
        voiced=jnp.asarray(voiced),
        rng=jax.random.PRNGKey(0),
        prior=jnp.asarray(captured["prior"]),
    ).audio
    want = want.reshape(B, -1)
    got = np.asarray(got).reshape(B, -1)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert max_rel(got, want) < 1e-3, max_rel(got, want)


def test_speech_predictor_parity():
    """End-to-end acoustic path: TextEncoder -> Decoder -> MultiGenerator."""
    ref = ref_module("speech_predictor")
    from stylish_tts_tpu.config import ModelConfig

    mc = ModelConfig()
    mc.inter_dim = 16
    mc.style_dim = 8
    mc.n_fft = 64
    mc.win_length = 64
    mc.text_encoder.tokens = 20
    mc.text_encoder.hidden_dim = 16
    mc.text_encoder.filter_channels = 32
    mc.text_encoder.heads = 2
    mc.text_encoder.layers = 1
    mc.text_encoder.dropout = 0.0
    mc.decoder.hidden_dim = 12
    mc.decoder.residual_dim = 6
    mc.generator.input_dim = 12
    mc.generator.io_conv_kernel_size = 3
    mc.generator.conformer_layers = 1
    mc.generator.conv_layers = 4
    mc.imported_weights = True

    tmc = _NS(
        inter_dim=16, style_dim=8, n_fft=64, win_length=64, hop_length=300,
        sample_rate=24000,
        text_encoder=_NS(tokens=20, hidden_dim=16, filter_channels=32,
                         heads=2, layers=1, kernel_size=3, dropout=0.0),
        decoder=_NS(hidden_dim=12, residual_dim=6),
        generator=_NS(input_dim=12, io_conv_kernel_size=3,
                      conformer_layers=1, conv_layers=4),
    )
    tm = ref.SpeechPredictor(tmc)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    tm.eval()
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_speech_predictor(
        sd, text_layers=1, conformer_layers=1, conv_layers=4
    )}

    captured = {}
    orig_forward = tm.generator.basegen.m_source.forward

    def capture(x, source_len):
        out = orig_forward(x, source_len)
        captured["prior"] = out[0].squeeze(2).detach().numpy()
        return out

    tm.generator.basegen.m_source.forward = capture

    from stylish_tts_tpu.models import build_model

    models = build_model(mc)
    fm = models["speech_predictor"]

    B, L, F = 2, 7, 4
    texts = np.random.randint(1, 20, (B, L)).astype(np.int64)
    lengths = np.array([L, L - 2], np.int64)
    align = np.zeros((B, L, F), np.float32)
    for b in range(B):
        for f in range(F):
            align[b, min(f * L // F, L - 1), f] = 1.0
    pitch = np.full((B, F), 220.0, np.float32)
    energy = np.random.randn(B, F).astype(np.float32)
    voiced = np.ones((B, F), np.float32)
    style = np.random.randn(B, 8).astype(np.float32)

    with torch.no_grad():
        want = tm(
            torch.from_numpy(texts), torch.from_numpy(lengths),
            torch.from_numpy(align), torch.from_numpy(pitch),
            torch.from_numpy(energy), torch.from_numpy(voiced),
            torch.from_numpy(style), torch.from_numpy(pitch),
        ).audio.numpy()

    got = fm.apply(
        params,
        jnp.asarray(texts), jnp.asarray(lengths), jnp.asarray(align),
        jnp.asarray(pitch), jnp.asarray(energy), jnp.asarray(voiced),
        jnp.asarray(style), jnp.asarray(pitch),
        rng=jax.random.PRNGKey(0), prior=jnp.asarray(captured["prior"]),
    ).audio
    want = want.reshape(B, -1)
    got = np.asarray(got).reshape(B, -1)
    assert got.shape == want.shape
    # fp32 accumulation noise through exp/atan2/iSTFT in a deep stack
    assert max_rel(got, want) < 3e-3, max_rel(got, want)


def test_text_style_encoder_parity():
    ref = ref_module("text_style_encoder")
    tm = ref.TextStyleEncoder(inter_dim=12, style_dim=8, config=_NS(layers=2))
    sd = fold_state_dict(tm.state_dict())
    params = {"params": {
        "conv_in": ti.conv1d_w(sd, "conv_in"),
        **{f"block_{i}": {
            "dwconv": ti.conv1d_w(sd, f"blocks.{i}.dwconv"),
            "LayerNorm_0": ti.layer_norm(sd, f"blocks.{i}.norm"),
            "pwconv1": ti.dense(sd, f"blocks.{i}.pwconv1"),
            "GRN_0": ti.grn(sd, f"blocks.{i}.grn"),
            "pwconv2": ti.dense(sd, f"blocks.{i}.pwconv2"),
        } for i in range(2)},
    }}

    from stylish_tts_tpu.models.text_style_encoder import TextStyleEncoder

    fm = TextStyleEncoder(inter_dim=12, style_dim=8, n_layers=2)
    B, T = 2, 11
    x = np.random.randn(B, 12, T).astype(np.float32)
    lengths = np.array([11, 7], np.int64)
    want = run_torch(tm, torch.from_numpy(x), torch.from_numpy(lengths))
    got = fm.apply(params, jnp.asarray(x.transpose(0, 2, 1)), jnp.asarray(lengths))
    assert max_rel(got, want.numpy()) < 1e-4, max_rel(got, want.numpy())


def test_generate_pcph_parity():
    """pcph harmonic prior (ringformer) vs the reference function with
    the random initial phase zeroed on both sides."""
    ref = ref_module("generator")
    from stylish_tts_tpu.models.ringformer import generate_pcph

    B, F, hop, sr = 2, 12, 60, 24000
    f0 = np.zeros((B, F), np.float32)
    f0[0] = 220.0
    f0[1, :6] = 147.0  # second half unvoiced
    voiced = (f0 > 0).astype(np.float32)

    orig_rand = torch.rand
    try:
        torch.rand = lambda *a, **k: orig_rand(*a, **k) * 0
        with torch.no_grad():
            want = ref.generate_pcph(
                torch.from_numpy(f0)[:, None], torch.from_numpy(voiced)[:, None],
                hop_length=hop, sample_rate=sr,
            ).numpy()[:, 0]
    finally:
        torch.rand = orig_rand

    got = np.asarray(generate_pcph(
        jnp.asarray(f0), jnp.asarray(voiced), hop, sr, rng=None
    ))
    assert got.shape == want.shape
    assert max_rel(got, want) < 1e-3, max_rel(got, want)


def test_upsample_generator_parity():
    """Full ringformer vocoder (UpsampleGenerator) vs the reference
    (generator.py:66-259) with ported weights, faithful mode.

    A fixed broadband excitation is injected as the prior on BOTH sides
    (pcph itself is golden-tested above): a harmonic prior's near-zero
    STFT bins make atan2 phase round-off noise no two STFT
    implementations agree on (see UpsampleGenerator docstring)."""
    ref = ref_module("generator")
    B, T = 2, 4
    rates, kerns = (4, 5), (8, 10)
    tm = ref.UpsampleGenerator(
        style_dim=8,
        resblock_kernel_sizes=[3, 7, 11],
        upsample_rates=list(rates),
        upsample_initial_channel=32,
        upsample_last_channel=8,
        resblock_dilation_sizes=[[1, 3, 5]] * 3,
        upsample_kernel_sizes=list(kerns),
        gen_istft_n_fft=60,
        gen_istft_hop_size=15,
        sample_rate=24000,
    )
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    tm.eval()
    sd = fold_state_dict(tm.state_dict())
    params = {"params": ti.convert_upsample_generator(sd, n_up=2)}

    prior_hop = 4 * 5 * 15
    prior = (np.random.randn(B, T * prior_hop) * 0.1).astype(np.float32)
    # zero the edge samples: the center-reflect-padded first/last STFT
    # frames are even-symmetric, so their DFT is purely real and the
    # har_phase there is +-pi ROUND-OFF SIGN NOISE on both frameworks
    # (torch's own imag is ~1e-8 there); all-zero edge frames give a
    # well-defined phase of 0 on both sides instead.
    prior[:, :60] = 0.0
    prior[:, -60:] = 0.0
    tm.prior_generator = lambda f0, vuv, **kw: torch.from_numpy(prior)[
        :, None, :
    ]

    mel = np.random.randn(B, 32, T).astype(np.float32)
    style = np.random.randn(B, 8).astype(np.float32)
    pitch = np.full((B, T), 220.0, np.float32)
    energy = np.random.randn(B, T).astype(np.float32)
    voiced = np.ones((B, T), np.float32)
    with torch.no_grad():
        want = tm(
            torch.from_numpy(mel), torch.from_numpy(style),
            torch.from_numpy(pitch), torch.from_numpy(energy),
            torch.from_numpy(voiced),
        )

    from stylish_tts_tpu.models.ringformer import UpsampleGenerator

    fm = UpsampleGenerator(
        style_dim=8,
        resblock_kernel_sizes=(3, 7, 11),
        upsample_rates=rates,
        upsample_initial_channel=32,
        upsample_last_channel=8,
        gen_istft_n_fft=60,
        gen_istft_hop_size=15,
        sample_rate=24000,
        conformer_depth=2,
        faithful=True,
        upsample_kernel_sizes=kerns,
    )
    got = fm.apply(
        params,
        mel=jnp.asarray(mel.transpose(0, 2, 1)),
        style=jnp.asarray(style),
        pitch=jnp.asarray(pitch),
        energy=jnp.asarray(energy),
        voiced=jnp.asarray(voiced),
        rng=None,
        prior=jnp.asarray(prior),
    )
    want_audio = want.audio.numpy().reshape(B, -1)
    got_audio = np.asarray(got.audio).reshape(B, -1)
    assert got_audio.shape == want_audio.shape, (
        got_audio.shape, want_audio.shape
    )
    # the magnitude/phase heads feed the MagPhase loss during training
    assert max_rel(
        np.asarray(got.magnitude), want.magnitude.numpy()
    ) < 1e-3
    assert max_rel(got_audio, want_audio) < 1e-3, max_rel(
        got_audio, want_audio
    )
