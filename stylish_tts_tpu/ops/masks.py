"""Mask helpers shared by ops and data code (jit-safe, static shapes)."""

from __future__ import annotations

import jax.numpy as jnp


def sequence_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) -> (B, max_length) bool, True inside the sequence."""
    pos = jnp.arange(max_length)[None, :]
    return pos < lengths[:, None]
