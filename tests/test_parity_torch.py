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


def max_rel(a: np.ndarray, b: np.ndarray) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max() / scale)


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
