"""Acoustic decoder (reference: train/models/decoder.py:7-90).

Concatenates aligned text encoding with smoothed F0 / energy / voiced
curves, runs an AdaIN encode block and 4 decode blocks with an asr
residual.  The reference's train-time F0/N random box-filter smoothing
augmentation (decoder.py:53-75, which hardcodes "cuda") becomes a
jit-safe lax.switch over precomputed box kernels driven by a PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import AdaptiveDecoderBlock, Conv1d


def _box_smooth(curve: jnp.ndarray, width: int) -> jnp.ndarray:
    """Box-filter smooth a (B, T) curve with odd-ish padding like torch conv."""
    if width == 0:
        return curve
    kernel = jnp.ones((1, 1, width), dtype=curve.dtype) / width
    x = curve[:, None, :]
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,),
        padding=[(width // 2, width // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    return out[:, : curve.shape[1]]


class Decoder(nn.Module):
    dim_in: int
    style_dim: int
    hidden_dim: int
    residual_dim: int

    @nn.compact
    def __call__(
        self,
        asr,  # (B, T, dim_in) aligned text encoding
        f0_curve,  # (B, T)
        energy,  # (B, T)
        style,  # (B, style_dim)
        voiced,  # (B, T)
        *,
        training: bool = False,
        smooth_rng: jax.Array | None = None,
    ):
        if training and smooth_rng is not None:
            k1, k2 = jax.random.split(smooth_rng)
            f0_widths = [0, 7, 15]
            n_widths = [0, 7, 15, 31]
            f0_idx = jax.random.randint(k1, (), 0, len(f0_widths))
            n_idx = jax.random.randint(k2, (), 0, len(n_widths))
            f0_curve = jax.lax.switch(
                f0_idx, [lambda c, w=w: _box_smooth(c, w) for w in f0_widths], f0_curve
            )
            energy = jax.lax.switch(
                n_idx, [lambda c, w=w: _box_smooth(c, w) for w in n_widths], energy
            )

        f0 = Conv1d(1, 3, name="f0_conv")(f0_curve[..., None])
        n = Conv1d(1, 3, name="n_conv")(energy[..., None])
        v = Conv1d(1, 3, name="voiced_conv")(voiced[..., None])

        x = jnp.concatenate([asr, f0, n, v], axis=-1)
        x = AdaptiveDecoderBlock(
            self.dim_in + 3, self.hidden_dim, name="encode"
        )(x, style, training=training)

        asr_res = Conv1d(self.residual_dim, 1, name="asr_res")(asr)

        for i in range(4):
            x = jnp.concatenate([x, asr_res, f0, n, v], axis=-1)
            x = AdaptiveDecoderBlock(
                self.hidden_dim + 3 + self.residual_dim,
                self.hidden_dim,
                name=f"decode_{i}",
            )(x, style, training=training)
        return x, f0_curve
