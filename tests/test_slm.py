"""Golden parity: JAX WavLM vs a randomly initialized HF torch WavLM."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from stylish_tts_tpu.models.slm import (
    WavLMEncoder,
    convert_torch_wavlm,
    make_wavlm_loss,
    resample_24k_to_16k,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(0)
    return WavLMModel(WavLMConfig()).eval()


def test_wavlm_hidden_states_match_torch(torch_model):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref = torch_model(
            input_values=torch.from_numpy(audio), output_hidden_states=True
        ).hidden_states
    params = convert_torch_wavlm(torch_model.state_dict())
    ours = WavLMEncoder().apply(params, jnp.asarray(audio))

    assert len(ours) == len(ref) == 13
    for i, (a, b) in enumerate(zip(ours, ref)):
        a = np.asarray(a)
        b = b.numpy()
        assert a.shape == b.shape, (i, a.shape, b.shape)
        scale = np.abs(b).mean() + 1e-6
        err = np.abs(a - b).max() / scale
        # measured ~2.3e-3 max rel (fp32 accumulation-order differences)
        assert err < 1e-2, f"layer {i}: rel err {err}"


def test_resampler_tone():
    # 440 Hz tone at 24k resampled to 16k keeps its frequency
    sr = 24000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    out = np.asarray(resample_24k_to_16k(jnp.asarray(tone)))
    assert out.shape[1] == 16000
    spec = np.abs(np.fft.rfft(out[0, 2000:14000]))
    freqs = np.fft.rfftfreq(12000, 1 / 16000)
    peak = freqs[spec.argmax()]
    assert abs(peak - 440) < 3


def test_wavlm_loss_fn(torch_model):
    params = convert_torch_wavlm(torch_model.state_dict())
    loss_fn = make_wavlm_loss(params)
    rng = np.random.default_rng(1)
    a = jnp.asarray((rng.standard_normal((1, 6000)) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.standard_normal((1, 6000)) * 0.1).astype(np.float32))
    same = float(loss_fn(a, a))
    diff = float(loss_fn(a, b))
    assert same < 1e-6
    assert diff > same


def test_missing_wavlm_raises_without_optin(tmp_path):
    """slm weight > 0 with unloadable weights must fail loudly unless the
    user explicitly opts into the random-init structural fallback
    (VERDICT r2 item 5; the reference would fail in from_pretrained,
    losses.py:376-394)."""
    from stylish_tts_tpu.trainer.loop import try_load_wavlm_params

    missing = str(tmp_path / "nonexistent-model")
    with pytest.raises(RuntimeError, match="allow_random_fallback"):
        try_load_wavlm_params(missing)


def test_missing_wavlm_falls_back_with_optin(tmp_path):
    """With the opt-in, the repo-local random-init WavLM loads."""
    from stylish_tts_tpu.trainer.loop import try_load_wavlm_params

    missing = str(tmp_path / "nonexistent-model")
    params = try_load_wavlm_params(missing, allow_random_fallback=True)
    assert "params" in params or len(params) > 0
