"""STFT / iSTFT as framed DFT matmuls — the TPU-native formulation.

On TPU the FFT is not a primitive the MXU loves; a windowed DFT as a
dense (n_fft x freq_bins) matmul over strided frames is, and for the
small FFT sizes used in vocoders (512..2048) it is both exact and
fast.  The reference itself proved this formulation in its ONNX-safe
STFT (reference: src/stylish_tts/train/models/stft.py:6-196, conv1d /
conv_transpose1d with DFT-matrix kernels); here it becomes
``lax.conv_general_dilated`` with the DFT basis as the kernel, which
XLA tiles straight onto the MXU.

All transforms run in float32 islands regardless of the ambient
compute dtype — phase losses and iSTFT reconstruction need the
mantissa (SURVEY.md §7 "iSTFT/phase fidelity").

Conventions match ``torch.stft``: e^{-j 2 pi k n / N}, onesided,
center padding with either reflect (torch default, used by the loss
spectrograms) or edge/replicate (used by the generator head, matching
the reference's export-safe STFT).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class STFTParams:
    n_fft: int
    hop_length: int
    win_length: int
    center: bool = True
    pad_mode: str = "reflect"  # or "edge" (torch "replicate")


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


# The DFT bases are COMPUTED ON DEVICE inside the traced computation
# instead of being embedded as dense numpy constants.  Round-5 finding:
# inlining them baked ~130 MB of constants into the acoustic train
# step's StableHLO (the 2048-point basis alone is 16.8 MB, duplicated
# across forward/backward/layout copies), blowing the executable to
# 320 MB and the honest step time to ~3 s/execution.  An
# optimization_barrier on the iota stops XLA from constant-folding the
# basis back into the binary; regenerating it each execution is a few
# million VPU transcendentals — microseconds against the matmuls it
# feeds.
#
# Numerics: angles are reduced modulo n_fft BEFORE the trig in exact
# integer-valued f32 arithmetic (k*n <= ~8.4e6 < 2^24 is exact), so
# jnp.cos sees arguments in [0, 2*pi) and matches the old float64 numpy
# basis to ~1e-7 — f32 cos of the UNreduced angle (up to ~6400 rad)
# would have lost ~5e-4 of phase and broken golden parity.


def _phase_fraction(rows: jnp.ndarray, cols: jnp.ndarray, n_fft: int):
    """(rows x cols) matrix of (r*c mod n_fft)/n_fft, exactly reduced."""
    prod = rows[:, None] * cols[None, :]
    return jnp.mod(prod, float(n_fft)) * (1.0 / n_fft)


def _hann_jnp(win_length: int, n_fft: int) -> jnp.ndarray:
    n = jnp.arange(win_length, dtype=jnp.float32)
    w = 0.5 - 0.5 * jnp.cos((2.0 * jnp.pi / win_length) * n)
    if win_length < n_fft:
        w = jnp.pad(w, (0, n_fft - win_length))
    else:
        w = w[:n_fft]
    return w


def _forward_basis(n_fft: int, win_length: int) -> jnp.ndarray:
    """(2*freq_bins, 1, n_fft) windowed DFT conv kernel: rows = [real; imag].

    Traced (device-computed); see the module comment above for why this
    must not be a numpy constant."""
    freq_bins = n_fft // 2 + 1
    n = jax.lax.optimization_barrier(
        jnp.arange(n_fft, dtype=jnp.float32)
    )
    k = jnp.arange(freq_bins, dtype=jnp.float32)
    angle = (2.0 * jnp.pi) * _phase_fraction(k, n, n_fft)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    # exactify the DC and (even n_fft) Nyquist rows: mathematically
    # sin == 0 and cos == (-1)^n there, but fp sin leaves tiny residue
    # whose RANDOM SIGN flips atan2 phases between +pi and -pi
    # vs torch's exact +0 imaginary part (the ringformer har_phase path)
    cos = cos.at[0].set(1.0)
    sin = sin.at[0].set(0.0)
    if n_fft % 2 == 0:
        parity = jnp.where(jnp.arange(n_fft) % 2 == 0, 1.0, -1.0)
        cos = cos.at[-1].set(parity)
        sin = sin.at[-1].set(0.0)
    window = _hann_jnp(win_length, n_fft)
    real = cos * window
    imag = -sin * window
    return jnp.concatenate([real, imag], axis=0)[:, None, :]


def _inverse_basis(n_fft: int, win_length: int, uniform: bool = False):
    """(2*freq_bins, 1, n_fft) windowed IDFT conv_transpose kernel
    (traced, device-computed — see module comment).

    ``uniform=False``: proper real-iFFT scaling (symmetric bins doubled,
    DC/Nyquist once) — pairs with window-envelope normalization for exact
    torch.istft parity.  ``uniform=True``: every bin scaled 1/n_fft — the
    reference's conv iSTFT convention (reference stft.py:74-96, which
    deliberately skips the doubling); required when running imported
    torch generator weights.
    """
    freq_bins = n_fft // 2 + 1
    n = jax.lax.optimization_barrier(
        jnp.arange(n_fft, dtype=jnp.float32)
    )
    k = jnp.arange(freq_bins, dtype=jnp.float32)
    angle = (2.0 * jnp.pi) * _phase_fraction(k, n, n_fft)  # (freq, n_fft)
    if uniform:
        scale = jnp.full((freq_bins, 1), 1.0 / n_fft)
    else:
        # Doubling for the symmetric (negative-frequency) bins of the real
        # FFT; DC and Nyquist appear once.
        scale = jnp.full((freq_bins, 1), 2.0 / n_fft)
        scale = scale.at[0].set(1.0 / n_fft)
        if n_fft % 2 == 0:
            scale = scale.at[-1].set(1.0 / n_fft)
    window = _hann_jnp(win_length, n_fft)
    real_k = jnp.cos(angle) * scale * window
    imag_k = -jnp.sin(angle) * scale * window
    return jnp.concatenate([real_k, imag_k], axis=0)[:, None, :]


def _window_sumsquare_kernel(n_fft: int, win_length: int) -> jnp.ndarray:
    window = _hann_jnp(win_length, n_fft)
    return (window * window)[None, None, :]


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Overlap-add (B, T, n_fft) frames with the given hop -> (B, L).

    L = (T-1)*hop + n_fft.  When n_fft % hop == 0 this uses k = n_fft/hop
    shifted reshapes (exact, layout-friendly); otherwise it falls back to a
    conv_transpose formulation.
    """
    b, t, n_fft = frames.shape
    out_len = (t - 1) * hop + n_fft
    if n_fft % hop == 0:
        k = n_fft // hop
        chunks = frames.reshape(b, t, k, hop)
        wav = jnp.zeros((b, out_len), dtype=frames.dtype)
        for j in range(k):
            seg = chunks[:, :, j, :].reshape(b, t * hop)
            wav = wav.at[:, j * hop : j * hop + t * hop].add(seg)
        return wav
    # Fallback: transposed conv overlap-add (kernel = identity painter).
    spec = jnp.moveaxis(frames, 1, 2)  # (B, n_fft, T)
    eye = jnp.eye(n_fft, dtype=frames.dtype)[:, None, ::-1]  # IOH (n_fft, 1, n_fft)
    return jax.lax.conv_transpose(
        spec,
        eye,
        strides=(hop,),
        padding="VALID",
        dimension_numbers=("NCH", "IOH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]


def _pad_center(audio: jnp.ndarray, n_fft: int, pad_mode: str) -> jnp.ndarray:
    pad = n_fft // 2
    return jnp.pad(audio, ((0, 0), (pad, pad)), mode=pad_mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _framed_dft(xpad: jnp.ndarray, n_fft: int, hop_length: int,
                win_length: int) -> jnp.ndarray:
    """Windowed DFT of padded audio (B, Tpad) -> (B, 2*freq_bins, frames).

    Forward: one strided conv with the DFT basis as kernel (MXU).
    Backward: CUSTOM — jax's automatic transpose of this conv is a
    1-output-channel lhs-dilated convolution that cannot tile onto the
    MXU; the round-5 device trace measured it at 1.1-1.3 s PER
    RESOLUTION per step (~80% of the whole acoustic G+D step, 0.0076
    MFU). The hand VJP computes the same gradient as a dense
    (2F x n_fft) einsum (MXU) followed by overlap-add (VPU shift-adds):
    d loss/d x[s] = sum_{t,n: t*hop+n == s} (g @ basis)[t, n].
    """
    kernel = _forward_basis(n_fft, win_length)
    return jax.lax.conv_general_dilated(
        xpad[:, None, :],
        kernel,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _framed_dft_fwd(xpad, n_fft, hop_length, win_length):
    return _framed_dft(xpad, n_fft, hop_length, win_length), xpad.shape[1]


def _framed_dft_bwd(n_fft, hop_length, win_length, tpad, g):
    basis = _forward_basis(n_fft, win_length)[:, 0, :]  # (2F, n_fft)
    g_frames = jnp.einsum(
        "bft,fn->btn", g, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    gx = _overlap_add(g_frames, hop_length)  # (B, (T'-1)*hop + n_fft)
    # samples past the last full window received no gradient
    gx = jnp.pad(gx, ((0, 0), (0, tpad - gx.shape[1])))
    return (gx,)


_framed_dft.defvjp(_framed_dft_fwd, _framed_dft_bwd)


def stft(
    audio: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "reflect",
):
    """Forward STFT.

    audio: (B, T) -> (real, imag), each (B, freq_bins, frames).
    Matches torch.stft(..., center=True, onesided=True).
    """
    audio = audio.astype(jnp.float32)
    if center:
        audio = _pad_center(audio, n_fft, pad_mode)
    out = _framed_dft(audio, n_fft, hop_length, win_length)
    freq_bins = n_fft // 2 + 1
    return out[:, :freq_bins, :], out[:, freq_bins:, :]


def stft_magnitude_unit_phase(
    audio: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    pad_mode: str = "edge",
    eps: float = 1e-14,
):
    """(magnitude, cos_phase, sin_phase) — the generator-head interface
    (reference: stft.py:98-136 returns magnitude + unit-normalized x/y)."""
    real, imag = stft(audio, n_fft, hop_length, win_length, center, pad_mode)
    magnitude = jnp.sqrt(real * real + imag * imag + eps)
    return magnitude, real / magnitude, imag / magnitude


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
    center: bool = True,
    length: int | None = None,
    normalize_window: bool = True,
    uniform_scale: bool = False,
):
    """Inverse STFT via conv_transpose overlap-add.

    real/imag: (B, freq_bins, frames) -> (B, T).

    ``normalize_window=True`` divides by the window sum-of-squares
    envelope (exact reconstruction, like torch.istft).  The reference's
    conv iSTFT skips this (stft.py:138-187) and lets the model learn the
    envelope; pass False (with uniform_scale=True, see _inverse_basis)
    for behavioral parity with the generator head.
    """
    real = real.astype(jnp.float32)
    imag = imag.astype(jnp.float32)
    spec = jnp.concatenate([real, imag], axis=1)  # (B, 2*freq, frames)
    kernel = _inverse_basis(
        n_fft, win_length, uniform=uniform_scale
    )[:, 0, :]  # (2F, n_fft)

    # Frame synthesis as one fp32 MXU matmul, then overlap-add.  The
    # overlap-add itself is done with hop-strided shifts and adds (exact VPU
    # fp32) when n_fft is a multiple of hop — conv_transpose does not honor
    # full precision on all TPU backends.
    frames_syn = jnp.einsum(
        "bft,fn->btn",
        spec,
        kernel,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, T_frames, n_fft)
    wav = _overlap_add(frames_syn, hop_length)

    if normalize_window:
        n_frames = real.shape[-1]
        wss = _window_sumsquare_kernel(n_fft, win_length)[0, 0]
        env_frames = jnp.broadcast_to(wss[None, None, :], (1, n_frames, n_fft))
        envelope = _overlap_add(env_frames, hop_length)
        wav = wav / jnp.maximum(envelope, 1e-11)

    if center:
        pad = n_fft // 2
        wav = wav[:, pad:-pad]
    if length is not None:
        if wav.shape[-1] < length:
            wav = jnp.pad(wav, ((0, 0), (0, length - wav.shape[-1])))
        else:
            wav = wav[:, :length]
    return wav
