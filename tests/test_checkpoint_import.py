"""Round-trip: reference accelerate checkpoint -> import_torch_checkpoint
-> flax params, validated against the full init tree and golden-checked
on the end-to-end acoustic path.

Builds the 13 reference torch models at a small config, saves their
state_dicts in accelerate save_state naming (pytorch_model{_i}.bin,
reference train.py:467), and imports the directory.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_loader import ref_module  # noqa: E402


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _small_mc():
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
    mc.duration_predictor.n_layer = 2
    mc.duration_predictor.duration_classes = 5
    mc.pitch_energy_predictor.inter_dim = 16
    mc.style_encoder.max_channels = 32
    return mc


def _build_reference_models(mc):
    m_ta = ref_module("text_aligner")
    m_dp = ref_module("duration_predictor")
    m_pe = ref_module("pitch_energy_predictor")
    m_sp = ref_module("speech_predictor")
    m_d = ref_module("discriminator")
    m_ms = ref_module("mel_style_encoder")
    m_pd = ref_module("pitch_discriminator")

    tcfg = _NS(
        tokens=mc.text_encoder.tokens, hidden_dim=mc.text_encoder.hidden_dim,
        filter_channels=mc.text_encoder.filter_channels,
        heads=mc.text_encoder.heads, layers=mc.text_encoder.layers,
        kernel_size=mc.text_encoder.kernel_size,
        dropout=mc.text_encoder.dropout,
    )
    tmc = _NS(
        inter_dim=mc.inter_dim, style_dim=mc.style_dim, n_fft=mc.n_fft,
        win_length=mc.win_length, hop_length=mc.hop_length,
        sample_rate=mc.sample_rate, text_encoder=tcfg,
        decoder=_NS(hidden_dim=mc.decoder.hidden_dim,
                    residual_dim=mc.decoder.residual_dim),
        generator=_NS(input_dim=mc.generator.input_dim,
                      io_conv_kernel_size=mc.generator.io_conv_kernel_size,
                      conformer_layers=mc.generator.conformer_layers,
                      conv_layers=mc.generator.conv_layers),
    )
    dur = _NS(n_layer=mc.duration_predictor.n_layer, last_dropout=0.0,
              duration_classes=mc.duration_predictor.duration_classes,
              dropout=0.0, max_duration=50)
    se = lambda: m_ms.MelStyleEncoder(  # noqa: E731
        mc.style_encoder.n_mels, mc.style_dim, mc.style_encoder.max_channels,
        mc.style_encoder.skip_downsample,
    )
    return {
        "text_aligner": m_ta.tdnn_blstm_ctc_model_base(
            mc.text_aligner.n_mels, mc.text_encoder.tokens
        ),
        "duration_predictor": m_dp.DurationPredictor(
            style_dim=mc.style_dim, inter_dim=mc.inter_dim,
            text_config=tcfg, duration_config=dur,
        ),
        "pitch_energy_predictor": m_pe.PitchEnergyPredictor(
            style_dim=mc.style_dim,
            inter_dim=mc.pitch_energy_predictor.inter_dim,
            text_config=tcfg, duration_config=dur,
            pitch_energy_config=_NS(dropout=0.0),
        ),
        "speech_predictor": m_sp.SpeechPredictor(tmc),
        "disc": m_d.ContextFreeDiscriminator(),
        "mrd0": m_d.SpecDiscriminator(),
        "mrd1": m_d.SpecDiscriminator(),
        "mrd2": m_d.SpecDiscriminator(),
        "speech_style_encoder": se(),
        "pe_style_encoder": m_ms.PitchStyleEncoder(
            mc.style_encoder.n_mels, mc.style_dim,
            mc.style_encoder.max_channels, mc.style_encoder.skip_downsample,
            coarse_multiplier=mc.coarse_multiplier,
        ),
        "duration_style_encoder": se(),
        "pitch_disc": m_pd.PitchDiscriminator(dim_in=2, dim_hidden=64, kernel=21),
        "dur_disc": m_pd.PitchDiscriminator(dim_in=1, dim_hidden=64, kernel=5),
    }


def test_import_accelerate_checkpoint(tmp_path):
    from stylish_tts_tpu.convert.checkpoint_import import (
        REFERENCE_MODEL_ORDER,
        accelerate_model_file,
        import_torch_checkpoint,
    )

    torch.manual_seed(0)
    np.random.seed(0)
    mc = _small_mc()
    ref_models = _build_reference_models(mc)
    assert list(ref_models) == REFERENCE_MODEL_ORDER
    with torch.no_grad():
        for model in ref_models.values():
            for mod in model.modules():
                if isinstance(mod, torch.nn.BatchNorm1d):
                    mod.running_mean.normal_(0.0, 0.5)
                    mod.running_var.uniform_(0.5, 2.0)
    for i, name in enumerate(REFERENCE_MODEL_ORDER):
        torch.save(
            ref_models[name].state_dict(),
            accelerate_model_file(str(tmp_path), i),
        )

    # import validates every leaf against the init tree (shapes + paths)
    params = import_torch_checkpoint(str(tmp_path), mc, validate=True)
    assert mc.imported_weights

    # golden: end-to-end acoustic path through the imported weights
    from stylish_tts_tpu.models import build_model

    models = build_model(mc)
    tm = ref_models["speech_predictor"]
    tm.eval()
    captured = {}
    orig_forward = tm.generator.basegen.m_source.forward

    def capture(x, source_len):
        out = orig_forward(x, source_len)
        captured["prior"] = out[0].squeeze(2).detach().numpy()
        return out

    tm.generator.basegen.m_source.forward = capture

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
        ).audio.numpy().reshape(B, -1)

    got = models["speech_predictor"].apply(
        params["speech_predictor"],
        jnp.asarray(texts), jnp.asarray(lengths), jnp.asarray(align),
        jnp.asarray(pitch), jnp.asarray(energy), jnp.asarray(voiced),
        jnp.asarray(style), jnp.asarray(pitch),
        rng=jax.random.PRNGKey(0), prior=jnp.asarray(captured["prior"]),
    ).audio
    got = np.asarray(got).reshape(B, -1)
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 3e-3, err
