"""FreeGAN vocoder: harmonic-prior amplitude/phase iSTFT generator.

Capability parity with the reference MultiGenerator/Generator
(reference: train/models/generator.py:513-902):

  input conv + LayerNorm + style Conformer over mel features
  -> amplitude branch: ConvNeXt stack + pixel-shuffle upsampling x[3,5,5]
  -> harmonic prior: Hn-NSF sine source from upsampled F0, STFT'd to
     spec/phase priors at the head resolution (n_fft/8=64, hop/75=4)
  -> phase branch: [amp features ++ priors] -> ConvNeXt stack ->
     real/imag convs -> atan2
  -> iSTFT head (overlap-add DFT matmul) -> tanh audio.

TPU-native notes: layout is (B, T, C); "pixel shuffle" upsampling is a
dense channel expansion + reshape (an MXU matmul, no conv_transpose);
the sine source integrates phase at frame rate then linearly upsamples
(matching the reference's coarse-rate integration, generator.py:365-382);
optional jax.checkpoint rematerialization on the audio-rate ConvNeXt
stacks trades ~15% FLOPs for ~2x training batch headroom.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import GeneratorConfig
from ..dsp import stft as stft_lib
from .common import AdaptiveGeneratorBlock, Conv1d
from .conformer import Conformer
from .convnext import GeneratorConvNeXtBlock


class DecoderPrediction(NamedTuple):
    audio: jnp.ndarray  # (B, T_samples)
    magnitude: Optional[jnp.ndarray] = None
    phase: Optional[jnp.ndarray] = None


def _linear_resize(x: jnp.ndarray, new_len: int) -> jnp.ndarray:
    """Linear interpolation along the last axis (align_corners=False)."""
    return jax.image.resize(
        x, x.shape[:-1] + (new_len,), method="linear", antialias=False
    )


class SineSource(nn.Module):
    """Hn-NSF harmonic sine source (reference generator.py:295-510).

    F0 (B, frames) -> merged sine excitation (B, frames*hop).
    Harmonics are summed through a learned linear + tanh; voiced/unvoiced
    switching adds scaled noise in unvoiced regions.
    """

    sample_rate: int
    hop_length: int
    harmonic_num: int = 8
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 10.0
    deterministic: bool = False  # zero init phase + noise (parity/golden tests)

    @nn.compact
    def __call__(self, f0: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        b, frames = f0.shape
        source_len = frames * self.hop_length
        n_harm = self.harmonic_num + 1
        # (B, frames, n_harm) harmonic frequencies in radians/sample
        harmonics = jnp.arange(1, n_harm + 1, dtype=jnp.float32)
        rad_per_sample = (f0[..., None] * harmonics) / self.sample_rate
        rad_per_sample = jnp.mod(rad_per_sample, 1.0)

        # random initial phase per harmonic except the fundamental
        k_phase, k_noise = jax.random.split(rng)
        rand_ini = jax.random.uniform(k_phase, (b, n_harm))
        rand_ini = rand_ini.at[:, 0].set(0.0)
        if self.deterministic:
            rand_ini = jnp.zeros_like(rand_ini)

        # integrate at FRAME rate, then linearly upsample the phase
        # (reference generator.py:365-382: interpolate-then-cumsum at the
        # coarse rate x upsample_scale — 1/hop the cumsum work and error
        # accumulation of an audio-rate integration)
        rad = jnp.moveaxis(rad_per_sample, 1, 2)  # (B, n_harm, frames)
        phase_frame = (
            jnp.cumsum(rad.astype(jnp.float32), axis=-1)
            * (2.0 * jnp.pi * self.hop_length)
        )
        phase = _linear_resize(phase_frame, source_len)  # (B, n_harm, T)
        phase = phase + (rand_ini * 2.0 * jnp.pi)[:, :, None]
        sines = jnp.sin(phase) * self.sine_amp  # (B, n_harm, T)

        uv_frame = (f0 > self.voiced_threshold).astype(jnp.float32)
        uv = _linear_resize(uv_frame[:, None, :], source_len)  # (B, 1, T)
        noise_amp = uv * self.noise_std + (1.0 - uv) * self.sine_amp / 3.0
        noise = noise_amp * jax.random.normal(k_noise, sines.shape)
        if self.deterministic:
            noise = jnp.zeros_like(noise)
        sines = sines * uv + noise

        # merge harmonics: (B, T, n_harm) -> linear -> tanh -> (B, T)
        merged = nn.Dense(1, name="merge")(jnp.moveaxis(sines, 1, 2))
        return jnp.tanh(merged)[..., 0]


class _ScanConvNeXtBody(nn.Module):
    """scan body: (carry=x, broadcast style) -> (new x, None)."""

    dim: int
    intermediate_dim: int

    @nn.compact
    def __call__(self, x, style):
        return GeneratorConvNeXtBlock(
            self.dim, self.intermediate_dim, name="block"
        )(x, style), None


def _scanned_convnext_stack(n_layers, dim, inter, name, remat=False):
    """n identical ConvNeXt blocks rolled with nn.scan: ONE compiled
    block body instead of n inlined copies.

    The acoustic step's executable is ~245 MB of code spread over ~800
    fused kernels (round-5 trace); the repeated ConvNeXt stacks are the
    bulk of that repetition. Rolling them shrinks the program ~n_layers
    fold for these stacks — smaller executables compile faster through
    the remote-compile tunnel (the B=64 blocker was a 42.6 MB StableHLO
    upload) at the cost of scan-carry overhead per layer. Param layout
    changes (leading stacked axis), so this is an opt-in config knob
    (generator.scan_stacks) for from-scratch training; imported torch
    checkpoints keep the unrolled layout. The megatron sharding rules
    (parallel/sharding_rules.py) address pwconv kernels by NEGATIVE
    axis, so the extra leading axis shards identically.
    """
    body = _ScanConvNeXtBody
    if remat:
        body = nn.remat(body, prevent_cse=False)
    return nn.scan(
        body,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=nn.broadcast,
        length=n_layers,
    )(dim, inter, name=name)


class Generator(nn.Module):
    """Amplitude/phase iSTFT head generator (reference generator.py:513-799)."""

    style_dim: int
    n_fft: int
    win_length: int
    hop_length: int
    sample_rate: int
    scale: int  # head works at n_fft/scale resolution
    scalehop: int  # and hop/scalehop
    start_fft: int
    hidden_dim: int
    input_dim: int
    io_conv_kernel_size: int
    conv_layers: int
    upsample_rates: Sequence[int]
    remat: bool = False
    scan_stacks: bool = False

    @nn.compact
    def __call__(
        self, mel, style, pitch, voiced, *, rng: jax.Array, prior=None,
        deterministic_prior: bool = False,
    ):
        """mel: (B, frames, input_dim); pitch/voiced: (B, frames) at frame rate.

        ``prior`` optionally overrides the stochastic harmonic source with a
        precomputed excitation (B, frames*hop) — used for deterministic
        export and for golden parity against the torch reference.

        Returns audio (B, frames * hop_length) [pre-tanh].
        """
        head_fft = self.n_fft // self.scale
        head_hop = self.hop_length // self.scalehop
        fft_dim = head_fft // 2 + 1
        end_fft = self.start_fft + self.hidden_dim
        ConvNeXt = (
            nn.remat(GeneratorConvNeXtBlock)
            if self.remat
            else GeneratorConvNeXtBlock
        )

        # ---- harmonic prior (no grad through the source) ----
        if prior is None:
            prior = SineSource(
                sample_rate=self.sample_rate,
                hop_length=self.hop_length,
                harmonic_num=8,
                voiced_threshold=10.0,
                deterministic=deterministic_prior,
                name="source",
            )(pitch * voiced, rng)
        else:
            # keep the SineSource params in the tree for checkpoint shape
            # stability even when the prior is injected
            SineSource(
                sample_rate=self.sample_rate,
                hop_length=self.hop_length,
                harmonic_num=8,
                voiced_threshold=10.0,
                name="source",
            )(pitch * voiced, rng)
        prior = jax.lax.stop_gradient(prior)
        har_mag, har_x, har_y = stft_lib.stft_magnitude_unit_phase(
            prior, head_fft, head_hop, head_fft, center=True, pad_mode="edge"
        )
        har_phase = jnp.arctan2(har_y * har_mag, har_x * har_mag)
        # strip trailing frame, select the head band, to (B, T', C)
        har_spec = jnp.moveaxis(har_mag[:, self.start_fft : end_fft, :-1], 1, 2)
        har_phase = jnp.moveaxis(har_phase[:, self.start_fft : end_fft, :-1], 1, 2)

        logamp_prior = Conv1d(
            self.hidden_dim, self.io_conv_kernel_size, name="amp_prior_conv"
        )(har_spec)
        logamp_prior = AdaptiveGeneratorBlock(
            self.hidden_dim, kernel_size=11, name="amp_prior_block"
        )(logamp_prior, style)
        phase_prior = Conv1d(
            self.hidden_dim, self.io_conv_kernel_size, name="phase_prior_conv"
        )(har_phase)
        phase_prior = AdaptiveGeneratorBlock(
            self.hidden_dim, kernel_size=11, name="phase_prior_block"
        )(phase_prior, style)

        # ---- amplitude trunk: ConvNeXt + pixel-shuffle upsampling ----
        x = mel
        dim = self.input_dim
        amp_layers = self.conv_layers - len(self.upsample_rates)
        if self.scan_stacks:
            x, _ = _scanned_convnext_stack(
                amp_layers, dim, dim * 4, "amp_convnext_scan",
                remat=self.remat,
            )(x, style)
        else:
            for i in range(amp_layers):
                x = ConvNeXt(dim, dim * 4, name=f"amp_convnext_{i}")(x, style)
        for i, stride in enumerate(self.upsample_rates):
            out_dim = dim // 2
            # dense channel expansion + reshape == sub-pixel upsample (MXU).
            # Channel grouping is c-major (channel index = c*stride + s) to
            # match the reference rearrange "b (c s) t -> b c (t s)"
            # (generator.py:747) for weight-ported parity.
            h = Conv1d(out_dim * stride, 11, name=f"upconv_{i}")(x)
            b, t, _ = h.shape
            x = (
                h.reshape(b, t, out_dim, stride)
                .swapaxes(2, 3)
                .reshape(b, t * stride, out_dim)
            )
            x = ConvNeXt(out_dim, out_dim * 4, name=f"upblock_{i}")(
                x, style
            )
            dim = out_dim

        # ---- amplitude head ----
        logamp = nn.LayerNorm(epsilon=1e-6, name="amp_final_norm")(x)
        logamp = Conv1d(
            self.hidden_dim, self.io_conv_kernel_size, name="amp_output_conv"
        )(logamp)

        # ---- phase branch ----
        phase_in = jnp.concatenate([x, logamp_prior, phase_prior], axis=-1)
        phase = Conv1d(
            self.hidden_dim, self.io_conv_kernel_size, name="phase_input_conv"
        )(phase_in)
        phase = nn.LayerNorm(epsilon=1e-6, name="phase_norm")(phase)
        if self.scan_stacks:
            phase, _ = _scanned_convnext_stack(
                self.conv_layers, self.hidden_dim, self.hidden_dim * 4,
                "phase_convnext_scan", remat=self.remat,
            )(phase, style)
        else:
            for i in range(self.conv_layers):
                phase = ConvNeXt(
                    self.hidden_dim, self.hidden_dim * 4,
                    name=f"phase_convnext_{i}",
                )(phase, style)
        phase = nn.LayerNorm(epsilon=1e-6, name="phase_final_norm")(phase)
        real = Conv1d(
            self.hidden_dim, self.io_conv_kernel_size, name="phase_real_conv"
        )(phase)
        imag = Conv1d(
            self.hidden_dim, self.io_conv_kernel_size, name="phase_imag_conv"
        )(phase)
        phase = jnp.arctan2(imag.astype(jnp.float32), real.astype(jnp.float32))

        # replicate-pad one trailing frame (matches the stripped prior frame)
        logamp = jnp.concatenate([logamp, logamp[:, -1:, :]], axis=1)
        phase = jnp.concatenate([phase, phase[:, -1:, :]], axis=1)

        # ---- iSTFT synthesis (fp32 island) ----
        spec = jnp.exp(jnp.clip(logamp.astype(jnp.float32), -35.0, 35.0))
        frames = spec.shape[1]
        b = spec.shape[0]
        spec_full = jnp.zeros((b, frames, fft_dim), jnp.float32)
        spec_full = spec_full.at[:, :, self.start_fft : end_fft].set(spec)
        phase_full = jnp.zeros((b, frames, fft_dim), jnp.float32)
        phase_full = phase_full.at[:, :, self.start_fft : end_fft].set(phase)
        real_full = jnp.moveaxis(spec_full * jnp.cos(phase_full), 1, 2)
        imag_full = jnp.moveaxis(spec_full * jnp.sin(phase_full), 1, 2)
        audio = stft_lib.istft(
            real_full,
            imag_full,
            head_fft,
            head_hop,
            head_fft,
            center=True,
            normalize_window=False,
            uniform_scale=True,  # reference conv-iSTFT convention (stft.py:78)
        )
        return audio


class MultiGenerator(nn.Module):
    """Conformer front end + base generator (reference generator.py:802-901)."""

    style_dim: int
    n_fft: int
    win_length: int
    hop_length: int
    sample_rate: int
    config: GeneratorConfig

    @nn.compact
    def __call__(
        self,
        *,
        mel,  # (B, frames, input_dim) decoder output
        style,  # (B, style_dim)
        pitch,  # (B, frames) F0 Hz
        energy,  # (B, frames) unused by the net, part of the API
        voiced,  # (B, frames)
        rng: jax.Array,
        training: bool = False,
        prior=None,  # optional precomputed harmonic excitation (B, frames*hop)
        deterministic_prior: bool = False,  # zero sine-source noise/phase
    ) -> DecoderPrediction:
        hidden_dim = self.n_fft // 2
        x = Conv1d(
            hidden_dim, self.config.io_conv_kernel_size, name="amp_input_conv"
        )(mel)
        x = nn.LayerNorm(epsilon=1e-6, name="amp_norm")(x)
        x = Conformer(
            dim=hidden_dim,
            depth=self.config.conformer_layers,
            attn_dropout=0.2,
            ff_dropout=0.2,
            conv_dropout=0.2,
            norm_mode=self.config.norm_mode,
            name="amp_conformer",
        )(x, style, training=training)

        audio = Generator(
            style_dim=self.style_dim,
            n_fft=self.n_fft,
            win_length=self.win_length,
            hop_length=self.hop_length,
            sample_rate=self.sample_rate,
            scale=8,
            scalehop=75,
            start_fft=0,
            hidden_dim=self.n_fft // 2 // 8,
            input_dim=hidden_dim,
            io_conv_kernel_size=self.config.io_conv_kernel_size,
            conv_layers=self.config.conv_layers,
            upsample_rates=(3, 5, 5),
            remat=self.config.remat,
            scan_stacks=self.config.scan_stacks,
            name="basegen",
        )(
            x, style, pitch, voiced, rng=rng, prior=prior,
            deterministic_prior=deterministic_prior,
        )
        return DecoderPrediction(audio=jnp.tanh(audio))
