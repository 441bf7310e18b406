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
    return out


def write_slm_cache(path: str, cache: Dict[str, np.ndarray]) -> None:
    save_cache(path, cache)
    mb = sum(v.nbytes for v in cache.values()) / 1e6
    logger.info("wrote slm cache: %d segments, %.1f MB -> %s",
                len(cache), mb, path)
