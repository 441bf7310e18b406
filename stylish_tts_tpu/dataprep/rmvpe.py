"""RMVPE neural pitch estimator, TPU-native port.

Reference: train/dataprep/rmvpe/ (E2E0 = DeepUnet0 encoder/decoder +
conv head + BiGRU + sigmoid salience over 360 20-cent bins;
model.py:49-86, deepunet.py, seq.py, spec.py, utils.py:114-131,
inference.py:12-62).  This environment cannot download the pretrained
rmvpe.safetensors (hf_hub stylish-tts/pitch_extractor), so the port is
exercised by golden tests against the torch reference architecture with
random weights; with the weights file present it is a drop-in
`stylish-train pitch --method rmvpe`.

Design: the model is INFERENCE-ONLY (the reference never trains it), so
it is written as pure jax functions over a converted parameter dict —
BatchNorm folded to per-channel affine, ConvTranspose2d expressed as an
input-dilated convolution, the BiGRU as two lax.scans with exact torch
gate math.  One jit per padded mel-length bucket.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30.0
MEL_FMAX = SAMPLE_RATE / 2
WINDOW_LENGTH = 1024
CONST = 1997.3794084376191
EN_DE_LAYERS = 5
INTER_LAYERS = 4
N_BLOCKS = 4
EN_OUT = 16


# ------------------------------------------------------------- conversion


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _bn(sd, base, eps=1e-5):
    mean, var = _np(sd[f"{base}.running_mean"]), _np(sd[f"{base}.running_var"])
    gamma, beta = _np(sd[f"{base}.weight"]), _np(sd[f"{base}.bias"])
    scale = gamma / np.sqrt(var + eps)
    return {"scale": scale, "bias": beta - mean * scale}


def _conv(sd, base):
    out = {"kernel": _np(sd[f"{base}.weight"]).transpose(2, 3, 1, 0)}
    if f"{base}.bias" in sd:
        out["bias"] = _np(sd[f"{base}.bias"])
    return out


def _convT(sd, base):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> kernel for an
    input-dilated conv_general_dilated: flip spatially, to HWIO."""
    w = _np(sd[f"{base}.weight"])  # (in, out, kh, kw)
    w = w[:, :, ::-1, ::-1]
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1))}


def _conv_block_res(sd, base):
    out = {
        "conv1": _conv(sd, f"{base}.conv.0"),
        "bn1": _bn(sd, f"{base}.conv.1"),
        "conv2": _conv(sd, f"{base}.conv.3"),
        "bn2": _bn(sd, f"{base}.conv.4"),
    }
    if f"{base}.shortcut.weight" in sd:
        out["shortcut"] = _conv(sd, f"{base}.shortcut")
    return out


def convert_rmvpe_torch(sd) -> Dict:
    """torch E2E0(4, 1, (2, 2)) state_dict -> jax param dict."""
    p: Dict = {"enc_bn": _bn(sd, "unet.encoder.bn")}
    for i in range(EN_DE_LAYERS):
        p[f"enc_{i}"] = [
            _conv_block_res(sd, f"unet.encoder.layers.{i}.conv.{j}")
            for j in range(N_BLOCKS)
        ]
    for i in range(INTER_LAYERS):
        p[f"inter_{i}"] = [
            _conv_block_res(sd, f"unet.intermediate.layers.{i}.conv.{j}")
            for j in range(N_BLOCKS)
        ]
    for i in range(EN_DE_LAYERS):
        base = f"unet.decoder.layers.{i}"
        p[f"dec_{i}"] = {
            "up": _convT(sd, f"{base}.conv1.0"),
            "up_bn": _bn(sd, f"{base}.conv1.1"),
            "blocks": [
                _conv_block_res(sd, f"{base}.conv2.{j}") for j in range(N_BLOCKS)
            ],
        }
    p["cnn"] = _conv(sd, "cnn")
    gru = {}
    for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
        gru[direction] = {
            "w_ih": _np(sd[f"fc.0.gru.weight_ih_l0{suffix}"]),
            "b_ih": _np(sd[f"fc.0.gru.bias_ih_l0{suffix}"]),
            "w_hh": _np(sd[f"fc.0.gru.weight_hh_l0{suffix}"]),
            "b_hh": _np(sd[f"fc.0.gru.bias_hh_l0{suffix}"]),
        }
    p["gru"] = gru
    p["fc"] = {"kernel": _np(sd["fc.1.weight"]).T, "bias": _np(sd["fc.1.bias"])}
    return p


def load_rmvpe_safetensors(path: str) -> Dict:
    from safetensors import safe_open

    sd = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return convert_rmvpe_torch(sd)


# ---------------------------------------------------------------- forward


def _conv2d(x, p, pad=1):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        out = out + jnp.asarray(p["bias"])
    return out


def _affine(x, p):
    return x * jnp.asarray(p["scale"]) + jnp.asarray(p["bias"])


def _block(x, p):
    h = jax.nn.relu(_affine(_conv2d(x, p["conv1"]), p["bn1"]))
    h = jax.nn.relu(_affine(_conv2d(h, p["conv2"]), p["bn2"]))
    if "shortcut" in p:
        return h + _conv2d(x, p["shortcut"], pad=0)
    return h + x


def _blocks(x, plist):
    for p in plist:
        x = _block(x, p)
    return x


def _avg_pool2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def _conv_transpose2(x, p):
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1)
    == conv over 2x input-dilated x with padding (1, 2) per dim."""
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"]), (1, 1), [(1, 2), (1, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _gru_dir(x, g, reverse=False):
    """Exact torch GRU cell math over time. x: (B, T, F)."""
    w_ih = jnp.asarray(g["w_ih"]).T  # (F, 3H)
    w_hh = jnp.asarray(g["w_hh"]).T  # (H, 3H)
    b_ih = jnp.asarray(g["b_ih"])
    b_hh = jnp.asarray(g["b_hh"])
    hidden = w_hh.shape[0]
    gi = x @ w_ih + b_ih  # (B, T, 3H) — input projections hoisted (MXU)

    def cell(h, gi_t):
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h = (1.0 - z) * n + z * h
        return h, h

    h0 = jnp.zeros((x.shape[0], hidden), x.dtype)
    _, ys = jax.lax.scan(cell, h0, jnp.moveaxis(gi, 1, 0), reverse=reverse)
    return jnp.moveaxis(ys, 0, 1)


def rmvpe_forward(params: Dict, mel: jnp.ndarray) -> jnp.ndarray:
    """log-mel (B, N_MELS, T) -> salience (B, T, N_CLASS).

    T must be a multiple of 32 (caller pads reflect, inference.py:29-36).
    """
    # reference: mel.transpose(-1, -2).unsqueeze(1) -> (B, 1, T, M); the
    # NHWC equivalent is (B, T, M, 1)
    x = mel.transpose(0, 2, 1)[..., None]
    x = _affine(x, params["enc_bn"])
    skips = []
    for i in range(EN_DE_LAYERS):
        x = _blocks(x, params[f"enc_{i}"])
        skips.append(x)
        x = _avg_pool2(x)
    for i in range(INTER_LAYERS):
        x = _blocks(x, params[f"inter_{i}"])
    for i in range(EN_DE_LAYERS):
        d = params[f"dec_{i}"]
        x = jax.nn.relu(_affine(_conv_transpose2(x, d["up"]), d["up_bn"]))
        x = jnp.concatenate([x, skips[-1 - i]], axis=-1)
        x = _blocks(x, d["blocks"])
    x = _conv2d(x, params["cnn"])  # (B, T, M, 3)
    b, t = x.shape[:2]
    x = x.reshape(b, t, -1)  # flatten (M, 3) -> 3*M... order check below
    # torch: cnn(out).transpose(1, 2).flatten(-2): (B, 3, T, M) -> (B, T, 3, M)
    # -> (B, T, 3*M) with channel-major order; our NHWC gives (B, T, M, 3)
    # so transpose the last two axes before flattening.
    x = x.reshape(b, t, N_MELS, 3).transpose(0, 1, 3, 2).reshape(b, t, 3 * N_MELS)
    fwd = _gru_dir(x, params["gru"]["fwd"])
    bwd = _gru_dir(x, params["gru"]["bwd"], reverse=True)
    x = jnp.concatenate([fwd, bwd], axis=-1)
    x = x @ jnp.asarray(params["fc"]["kernel"]) + jnp.asarray(params["fc"]["bias"])
    return jax.nn.sigmoid(x)


# ------------------------------------------------------------ mel + decode


@functools.lru_cache(maxsize=2)
def _rmvpe_mel_basis() -> np.ndarray:
    """librosa.filters.mel(htk=True, norm='slaney') equivalent
    (reference spec.py:22-29)."""
    from ..dsp.mel import mel_filterbank

    fb = mel_filterbank(
        N_MELS, WINDOW_LENGTH, SAMPLE_RATE, f_min=MEL_FMIN, f_max=MEL_FMAX
    )  # (freq, n_mels), htk, unnormalized
    # slaney area normalization: 2 / (f_hi - f_lo) per filter
    def h2m(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

    def m2h(m):
        return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

    pts = m2h(np.linspace(h2m(MEL_FMIN), h2m(MEL_FMAX), N_MELS + 2))
    enorm = 2.0 / (pts[2:] - pts[:-2])
    return (fb * enorm[None, :]).T.astype(np.float32)  # (n_mels, freq)


def rmvpe_log_mel(audio16k: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(B, S) 16 kHz audio -> log-mel (B, N_MELS, T) (reference spec.py:39-71:
    torch.stft center/reflect, magnitude, mel matmul, log-clamp 1e-5)."""
    from ..dsp import stft as stft_lib

    real, imag = stft_lib.stft(
        audio16k, WINDOW_LENGTH, hop_length, WINDOW_LENGTH,
        center=True, pad_mode="reflect",
    )
    mag = jnp.sqrt(real * real + imag * imag + 1e-18)
    mel = jnp.einsum(
        "mf,bft->bmt", jnp.asarray(_rmvpe_mel_basis()), mag,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log(jnp.clip(mel, min=1e-5))


def decode_f0(salience: jnp.ndarray, thred: float = 0.03) -> jnp.ndarray:
    """Local weighted-average cents decode (reference utils.py:114-131)."""
    idx = jnp.arange(N_CLASS)[None, None, :]
    cents_map = idx * 20.0 + CONST
    center = jnp.argmax(salience, axis=2, keepdims=True)
    start = jnp.clip(center - 4, 0, None)
    end = jnp.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = salience * mask
    product = jnp.sum(weights * cents_map, axis=2)
    total = jnp.sum(weights, axis=2)
    cents = product / (total + (total == 0))
    f0 = 10.0 * 2.0 ** (cents / 1200.0)
    unvoiced = jnp.max(salience, axis=2) < thred
    return jnp.where(unvoiced, 0.0, f0)


class RMVPEPitchExtractor:
    """Drop-in NN pitch extractor: 24 kHz audio -> per-frame F0.

    hop matches the framework frame rate: hop16 = 16000 // (sr // hop)
    (reference pitch_extractor.py:53-56)."""

    def __init__(self, weights_path: str, sample_rate: int = 24000,
                 hop_length: int = 300):
        self.params = load_rmvpe_safetensors(weights_path)
        self.sample_rate = sample_rate
        self.hop16 = SAMPLE_RATE // (sample_rate // hop_length)
        self._jit = jax.jit(
            lambda mel: rmvpe_forward(self.params, mel)
        )

    def infer(self, audio: np.ndarray) -> np.ndarray:
        """(B, S) audio at self.sample_rate -> (B, frames) F0 Hz."""
        from ..models.slm import resample_24k_to_16k

        audio = jnp.asarray(audio, jnp.float32)
        if self.sample_rate != SAMPLE_RATE:
            assert self.sample_rate == 24000, self.sample_rate
            audio = resample_24k_to_16k(audio)
        mel = rmvpe_log_mel(audio, self.hop16)
        n_frames = mel.shape[-1]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        mel = jnp.pad(mel, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        salience = self._jit(mel)[:, :n_frames]
        return np.asarray(decode_f0(salience))
