"""Sentence embeddings for dynamic voicepacks.

The reference embeds segment texts with SBERT (stsb-mpnet-base-v2,
voicepack.py:38) and kNN-blends styles at synthesis time
(tts/cli.py:67-76).  sentence-transformers needs a model download, so
here: use it when importable/cached, otherwise fall back to a
self-contained hashed character-n-gram embedding — no external deps,
stable across runs, good enough to cluster stylistically similar
sentences by surface form.
"""

from __future__ import annotations

import hashlib
from typing import Callable, List

import numpy as np

DIM = 256


def _hashed_ngram_embed(text: str, dim: int = DIM) -> np.ndarray:
    vec = np.zeros(dim, np.float32)
    t = " " + text.lower() + " "
    for n in (2, 3, 4):
        for i in range(len(t) - n + 1):
            gram = t[i : i + n]
            h = int.from_bytes(
                hashlib.blake2b(gram.encode(), digest_size=8).digest(), "little"
            )
            vec[h % dim] += 1.0 / n
    norm = np.linalg.norm(vec)
    return vec / norm if norm > 0 else vec


def get_embedder() -> Callable[[List[str]], np.ndarray]:
    """Returns texts -> (N, D) embedding matrix."""
    try:
        import os

        # fail fast in zero-egress environments instead of retrying HF
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        from sentence_transformers import SentenceTransformer

        model = SentenceTransformer("stsb-mpnet-base-v2")

        def sbert(texts: List[str]) -> np.ndarray:
            return np.asarray(model.encode(texts))

        return sbert
    except Exception:
        def hashed(texts: List[str]) -> np.ndarray:
            return np.stack([_hashed_ngram_embed(t) for t in texts])

        return hashed
