"""Forced-alignment cache generation (the `align` command).

Parity with the reference align_text pipeline
(reference: train/dataprep/align_text.py:92-257): load the trained
aligner, run batched CTC posteriors over both splits, forced-align,
convert frame labels to per-token durations, write the alignment
safetensors plus per-segment confidence scores_{train,val}.txt.

The k2-on-CPU lattice (losses.py:579-615) is replaced by the batched
on-device Viterbi (ops/ctc.py) — whole duration bins align in one
device call.
"""

from __future__ import annotations

import logging
import os.path as osp
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.caches import save_cache
from ..data.collate import collate_batch
from ..dsp.mel import MelSpectrogram
from ..ops.ctc import ctc_forced_align
from ..trainer.normalization import NormalizationStats

logger = logging.getLogger("stylish_tts_tpu")


def calculate_alignments(
    dataset,
    aligner_model,
    aligner_params,
    model_config,
    normalization: NormalizationStats,
    batch_size: int = 8,
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Returns ({wav_path: (1, n_tokens) durations}, {wav_path: confidence})."""
    mc = model_config
    to_align_mel = MelSpectrogram(
        n_mels=mc.text_aligner.n_mels, n_fft=mc.text_aligner.n_fft,
        win_length=mc.text_aligner.win_length,
        hop_length=mc.hop_length * mc.coarse_multiplier,
        sample_rate=mc.sample_rate,
    )

    @jax.jit
    def align_batch(audio, text, text_lengths):
        mel = to_align_mel(audio)
        mel = (jnp.log(1e-5 + mel) - normalization.mel_log_mean) / (
            normalization.mel_log_std
        )
        frames = mel.shape[-1] - (mel.shape[-1] % 2)
        mel = jnp.moveaxis(mel[:, :, :frames], 1, 2)
        lengths = jnp.full((mel.shape[0],), frames, jnp.int32)
        log_probs = aligner_model.apply(aligner_params, mel, lengths)
        return ctc_forced_align(
            log_probs, lengths, text, text_lengths,
            blank_id=mc.text_encoder.tokens,
        )

    bins, _ = dataset.time_bins()
    durations: Dict[str, np.ndarray] = {}
    confidences: Dict[str, float] = {}
    for time_bin, idxs in sorted(bins.items()):
        for i in range(0, len(idxs), batch_size):
            chunk = idxs[i : i + batch_size]
            items = [dataset.load_segment(j) for j in chunk]
            batch, paths = collate_batch(
                items, hop_length=mc.hop_length, require_pitch=False
            )
            res = align_batch(
                jnp.asarray(batch.audio_gt), jnp.asarray(batch.text),
                jnp.asarray(batch.text_lengths),
            )
            durs = np.asarray(res.durations)
            scores = np.asarray(res.scores)
            for k, path in enumerate(paths):
                n = int(batch.text_lengths[k])
                durations[path] = durs[k : k + 1, :n].astype(np.float32)
                confidences[path] = float(np.exp(scores[k]))
                if confidences[path] < 0.1:
                    logger.warning(
                        "low alignment confidence %.3f for %s",
                        confidences[path], path,
                    )
    return durations, confidences


def write_alignment_outputs(
    out_root: str,
    alignment_path: str,
    split_durations: Dict[str, Dict[str, np.ndarray]],
    split_confidences: Dict[str, Dict[str, float]],
) -> None:
    merged = {}
    for split, durs in split_durations.items():
        merged.update(durs)
        scores_file = osp.join(out_root, f"scores_{split}.txt")
        with open(scores_file, "w", encoding="utf-8") as f:
            for path, score in sorted(
                split_confidences[split].items(), key=lambda kv: kv[1]
            ):
                f.write(f"{score:.6f} {path}\n")
    save_cache(alignment_path, merged)
