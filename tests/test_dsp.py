"""Golden-value tests for the DSP layer against torch.stft / reference math."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

import stylish_tts_tpu.dsp.stft as jstft
from stylish_tts_tpu.dsp.mel import MelSpectrogram, mel_filterbank
from stylish_tts_tpu.dsp.multi_spectrogram import MultiSpectrogram


def _rand_audio(b=2, t=4800, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((b, t)) * 0.3).astype(np.float32)


@pytest.mark.parametrize(
    "n_fft,hop,win",
    [(512, 300, 512), (512, 128, 512), (1024, 256, 1024), (2048, 512, 2048)],
)
def test_stft_matches_torch(n_fft, hop, win):
    audio = _rand_audio()
    real, imag = jstft.stft(jnp.asarray(audio), n_fft, hop, win, center=True)
    ref = torch.stft(
        torch.from_numpy(audio),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        return_complex=True,
    )
    np.testing.assert_allclose(np.asarray(real), ref.real.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(imag), ref.imag.numpy(), atol=2e-3)


def test_istft_roundtrip():
    audio = _rand_audio(b=1, t=3000)
    n_fft, hop, win = 512, 128, 512
    real, imag = jstft.stft(jnp.asarray(audio), n_fft, hop, win, center=True)
    rec = jstft.istft(
        real, imag, n_fft, hop, win, center=True, length=audio.shape[1]
    )
    # The tail beyond the last complete frame is unrecoverable (same as
    # torch.istft, which zero-pads it); compare the covered region.
    covered = (real.shape[-1] - 1) * hop - n_fft // 2
    np.testing.assert_allclose(
        np.asarray(rec)[:, :covered], audio[:, :covered], atol=1e-3
    )


def test_mel_filterbank_matches_torchaudio_formula():
    # Independent reimplementation of torchaudio.functional.melscale_fbanks
    # (HTK scale, norm=None) used as the golden value.
    n_mels, n_fft, sr = 80, 512, 24000
    freq_bins = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr / 2, freq_bins)

    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    m_pts = np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2)
    f_pts = mel2hz(m_pts)
    fb_ref = np.zeros((freq_bins, n_mels))
    for m in range(n_mels):
        lower, center, upper = f_pts[m], f_pts[m + 1], f_pts[m + 2]
        up = (all_freqs - lower) / (center - lower)
        down = (upper - all_freqs) / (upper - center)
        fb_ref[:, m] = np.maximum(0, np.minimum(up, down))

    fb = mel_filterbank(n_mels, n_fft, sr)
    np.testing.assert_allclose(fb, fb_ref, atol=1e-5)


def test_mel_spectrogram_shape_and_energy():
    audio = _rand_audio(b=2, t=24000)
    to_mel = MelSpectrogram(
        n_mels=80, n_fft=512, win_length=512, hop_length=300, sample_rate=24000
    )
    mel = to_mel(jnp.asarray(audio))
    assert mel.shape == (2, 80, 24000 // 300 + 1)
    assert np.all(np.asarray(mel) >= 0)
    # Parseval-flavored sanity: mel energy tracks signal energy.
    quiet = to_mel(jnp.asarray(audio) * 0.1)
    ratio = float(jnp.sum(quiet) / jnp.sum(mel))
    assert abs(ratio - 0.01) < 2e-3


def test_multi_spectrogram_features():
    audio = _rand_audio(b=1, t=12000)
    ms = MultiSpectrogram(sample_rate=24000)
    feats = ms(jnp.asarray(audio))
    assert len(feats.mel) == 3 and len(feats.phase) == 3 and len(feats.fft_mag) == 3
    assert feats.mel[0].shape[2] == 128  # 128-bin mel
    for phase in feats.phase:
        p = np.asarray(phase)
        assert np.all(p <= np.pi + 1e-5) and np.all(p >= -np.pi - 1e-5)
