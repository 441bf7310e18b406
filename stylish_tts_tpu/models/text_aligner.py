"""CTC text aligner: TDNN conv stack + FFN + log-softmax posteriors.

Capability parity with the reference tdnn_blstm_ctc_model_base
(reference: train/models/text_aligner.py:33-45): mel(80) input, three
TDNN layers (k=5,3,3, stride 1, hidden 640) + a 5-layer skip FFN, then
a linear head over n_tokens + 1 (blank id = n_tokens,
train_context.py:134).

TDNN BatchNorm(affine=False) -> GroupNorm(1); masking is applied
before each conv so padded frames don't bleed in.
"""

from __future__ import annotations

from flax import linen as nn

from .common import Conv1d, Norm1d, sequence_mask


class TextAligner(nn.Module):
    n_mels: int = 80
    n_tokens: int = 178
    hidden_dim: int = 640
    dropout: float = 0.1
    norm_mode: str = "group"  # "affine" when running imported torch weights

    @nn.compact
    def __call__(self, mel, mel_lengths, *, training: bool = False):
        """mel: (B, T, n_mels) -> log-probs (B, T, n_tokens + 1)."""
        x = mel
        mask = sequence_mask(mel_lengths, mel.shape[1]).astype(x.dtype)[..., None]
        for i, kernel in enumerate([5, 3, 3]):
            x = x * mask
            x = Conv1d(self.hidden_dim, kernel, name=f"tdnn_{i}")(x)
            x = nn.relu(x)
            # reference BatchNorm1d(affine=False) (text_aligner.py:168)
            x = Norm1d(
                self.hidden_dim,
                mode=self.norm_mode,
                use_scale=self.norm_mode == "affine",
                use_bias=self.norm_mode == "affine",
                name=f"tdnn_norm_{i}",
            )(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        # 5-layer FFN with ONE outer skip (reference Ffn text_aligner.py:245-274:
        # sequential Linear+ReLU+Dropout x5, then x_out = ffn(x) + x)
        h = x
        for i in range(5):
            h = nn.Dense(self.hidden_dim, name=f"ffn_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        x = x + h  # outer skip
        logits = nn.Dense(self.n_tokens + 1, name="out")(x)
        return nn.log_softmax(logits, axis=-1)
