"""Precomputed GT WavLM-embedding cache for the slm perceptual loss.

The slm loss (reference train/losses.py:376-394) L1-matches WavLM
hidden states of target vs predicted audio.  The target side is a pure
function of the dataset, so `stylish-train slm-cache` runs the frozen
encoder over every training segment ONCE and stores the stacked hidden
states; the acoustic step then reads them from the batch and only runs
WavLM on the *predicted* audio — half the slm compute per step, and a
perceptual run can start the moment real pretrained weights appear by
generating this cache (with those weights) and training against it
(VERDICT r2 item 5).

Cache format: one safetensors file keyed by segment wav path; each
value is float16 (13, T, 768) — the 12 transformer layers + input
projection at 50 fps of the 16 kHz resample.  ~3 MB per 3 s segment:
sizeable, which is why it is an explicit subcommand and not implicit.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data.caches import save_cache
from ..data.collate import collate_batch
from ..models.slm import wavlm_embed

logger = logging.getLogger("stylish_tts_tpu")

FINGERPRINT_KEY = "__wavlm_fingerprint__"


def wavlm_fingerprint(params) -> np.ndarray:
    """Order-stable 16-byte digest of the WavLM parameter values.

    Stored in the cache under FINGERPRINT_KEY and checked at train time
    so the slm loss can never silently compare GT embeddings from one
    network against predicted-audio embeddings from another (e.g. a
    cache built with real pretrained weights vs a random-init fallback
    at train time)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        arr = np.asarray(leaf, np.float32)
        h.update(str(path).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.ravel()[:256].tobytes())  # subsample: speed over rigor
    return np.frombuffer(h.digest(), dtype=np.uint8).copy()


def compute_slm_cache(
    dataset, wavlm_params, batch_size: int = 8
) -> Dict[str, np.ndarray]:
    """Run the frozen WavLM encoder over every segment of `dataset`
    (batched per time bin — static shapes, one compile per bin)."""
    embed = jax.jit(wavlm_embed)
    params = jax.tree.map(jnp.asarray, wavlm_params)
    out: Dict[str, np.ndarray] = {}
    bins, _ = dataset.time_bins()
    for _, idxs in sorted(bins.items()):
        for start in range(0, len(idxs), batch_size):
            items = [
                dataset.load_segment(i)
                for i in idxs[start : start + batch_size]
            ]
            batch, paths = collate_batch(
                items, hop_length=dataset.coarse_hop_length,
                require_pitch=False,
            )
            states = np.asarray(
                embed(params, jnp.asarray(batch.audio_gt)), np.float16
            )
            for k, path in enumerate(paths):
                out[path] = states[k]
    out[FINGERPRINT_KEY] = wavlm_fingerprint(wavlm_params)
    return out


def check_fingerprint(cache: Dict[str, np.ndarray], wavlm_params) -> None:
    """Raise if `cache` was built with different WavLM weights than
    `wavlm_params` (old fingerprint-less caches get a warning only)."""
    stored = cache.get(FINGERPRINT_KEY)
    if stored is None:
        logger.warning(
            "slm cache has no WavLM fingerprint (pre-fingerprint cache); "
            "cannot verify it matches the training-time weights"
        )
        return
    live = wavlm_fingerprint(wavlm_params)
    if not np.array_equal(np.asarray(stored, np.uint8), live):
        raise RuntimeError(
            "slm cache was built with DIFFERENT WavLM weights than the "
            "ones loaded for training — the loss would compare embeddings "
            "across two unrelated networks. Rebuild the cache with "
            "`stylish-train slm-cache` using the same weights (or delete "
            "dataset.slm_path to embed GT audio in-line)."
        )


def write_slm_cache(path: str, cache: Dict[str, np.ndarray]) -> None:
    save_cache(path, cache)
    mb = sum(v.nbytes for v in cache.values()) / 1e6
    n_segments = sum(1 for k in cache if k != FINGERPRINT_KEY)
    logger.info("wrote slm cache: %d segments, %.1f MB -> %s",
                n_segments, mb, path)
