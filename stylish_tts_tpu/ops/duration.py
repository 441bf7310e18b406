"""Duration class tables and soft alignment construction.

Capability parity with the reference DurationProcessor
(reference: train/utils.py:656-807): 16 ordinal duration classes with
the fixed class->duration table, duration->class quantization table,
softmax-expected durations, and the smooth parabolic-window soft
alignment matrix.

TPU note: ``duration_to_alignment`` takes the *static* total frame
count instead of deriving it from data (reference computes
``duration.sum().max().item()`` — a host sync and a dynamic shape;
here the bucket's frame count is a compile-time constant).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .masks import sequence_mask

CLASS_TO_DUR = np.array(
    [1, 2, 3, 4, 5, 6, 7, 9, 12, 15, 18, 22, 27, 32, 38, 46], dtype=np.float32
)

# dur (clamped 1..50) -> ordinal class id
DUR_TO_CLASS = np.array(
    [0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 7, 8, 8, 8, 9, 9, 9, 10, 10, 10]
    + [11] * 5
    + [12] * 5
    + [13] * 5
    + [14] * 7
    + [15] * 9,
    dtype=np.int32,
)


class DurationProcessor:
    def __init__(self, class_count: int = 16, max_dur: int = 50):
        self.class_count = class_count
        self.max_dur = max_dur
        self.class_to_dur_table = jnp.asarray(CLASS_TO_DUR)
        self.dur_to_class_table = jnp.asarray(DUR_TO_CLASS)

    def class_to_dur_soft(self, softdur: jnp.ndarray) -> jnp.ndarray:
        """(…, classes) softmax weights -> expected duration."""
        num = jnp.sum(softdur * self.class_to_dur_table, axis=-1)
        return num / (jnp.sum(softdur, axis=-1) + 1e-9)

    def class_to_dur_hard(self, classes: jnp.ndarray) -> jnp.ndarray:
        classes = jnp.clip(classes, 0, self.class_count - 1)
        return self.class_to_dur_table[classes]

    def dur_to_class(self, durs: jnp.ndarray) -> jnp.ndarray:
        durs = jnp.clip(durs, 1, self.max_dur).astype(jnp.int32)
        return self.dur_to_class_table[durs]

    def align_to_class(self, alignment: jnp.ndarray) -> jnp.ndarray:
        return self.dur_to_class(
            jnp.clip(jnp.sum(alignment, axis=-1), 1, self.max_dur)
        )

    def prediction_to_duration(self, pred, text_lengths):
        """(B, T, classes) logits -> (B, T) expected durations, masked."""
        confidence = jnp.exp(pred - jnp.max(pred, axis=-1, keepdims=True))
        confidence = confidence / jnp.sum(confidence, axis=-1, keepdims=True)
        softdur = self.class_to_dur_soft(confidence)
        mask = sequence_mask(text_lengths, pred.shape[1]).astype(softdur.dtype)
        return softdur * mask

    def duration_to_alignment(
        self, duration: jnp.ndarray, total_frames: int, multiplier: int = 1
    ) -> jnp.ndarray:
        """(B, T_text) durations -> (B, T_text, total_frames) soft alignment.

        Each token gets a clipped inverted-parabola window centered on its
        cumulative span, softmax-normalized over tokens per frame
        (reference utils.py:752-791).  ``total_frames`` is static.
        """
        duration = duration.astype(jnp.float32) * multiplier
        upper = jnp.cumsum(duration, axis=1)  # (B, T)
        lower = upper - duration
        mean = (lower + upper) / 2.0

        frames = jnp.arange(total_frames, dtype=jnp.float32)[None, None, :]
        x = frames - mean[..., None]
        window = 1.0 - jnp.square(x * 2.0 / (duration[..., None] + 6.0))
        keep = (frames > (lower - 3.0)[..., None]) & (frames < (upper + 3.0)[..., None])
        window = jnp.where(keep, window, 0.0)
        window = jnp.maximum(window, 0.0)
        return _softmax_over_tokens(window)

    def __call__(self, pred, text_lengths, total_frames: int, multiplier: int = 1):
        duration = self.prediction_to_duration(pred, text_lengths)
        return self.duration_to_alignment(duration, total_frames, multiplier)


def _softmax_over_tokens(window: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the token axis (dim 1), matching torch.softmax(x, dim=1)."""
    return jnp.exp(
        window - _logsumexp_axis1(window)
    )


def _logsumexp_axis1(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=1, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))
