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


def k2_pad_attribution(
    onsets: np.ndarray,  # (T,) bool: token-onset frames (inner tokens)
    argmax_blank: np.ndarray,  # (T,) bool: posterior argmax is blank/silence
    total_frames: int,
) -> np.ndarray:
    """The reference's DEFAULT duration attribution (``--method k2``):
    numpy port of the prefix/suffix pad-silence heuristic at
    align_text.py:417-475.

    k2 treats the pad symbol (id 0) as blank, so forced alignment runs
    over the INNER tokens only and this post-processing re-synthesizes
    the pad durations: leading silence goes to the prefix pad, each
    inner token owns its onset frame plus the silence after it, the
    LAST token's length is read from the posterior argmax (first
    predicted-silence frame after its onset), and whatever remains goes
    to the suffix pad.  Returns [prefix, inner..., suffix] durations.
    """
    token_idx = np.nonzero(onsets[:total_frames])[0]
    if token_idx.size == 0:
        # reference align_text.py:420-423: untrained model fallback
        return np.asarray([total_frames], np.float32)
    first_idx, last_idx = int(token_idx[0]), int(token_idx[-1])
    prefix_dur = first_idx
    token_durs = []
    current = 0
    for t in range(first_idx, last_idx):
        if onsets[t]:
            if current > 0:
                token_durs.append(current)
            current = 1
        else:
            current += 1
    if current > 0 and token_idx.size > 1:
        token_durs.append(current)
    tail = argmax_blank[last_idx:total_frames]
    sil = np.nonzero(tail)[0]
    last_dur = int(sil[0]) if sil.size else int(tail.size)
    last_dur = max(1, last_dur)
    token_durs.append(last_dur)
    suffix_dur = max(0, total_frames - (last_idx + last_dur))
    return np.asarray([prefix_dur] + token_durs + [suffix_dur], np.float32)


def calculate_alignments(
    dataset,
    aligner_model,
    aligner_params,
    model_config,
    normalization: NormalizationStats,
    batch_size: int = 8,
    method: str = "k2",
) -> Tuple[Dict[str, np.ndarray], Dict[str, float]]:
    """Returns ({wav_path: (1, n_tokens) durations}, {wav_path: confidence}).

    method: "k2" (the reference default, train/cli.py:130-133) aligns the
    inner tokens and attributes leading/trailing silence to the pad
    tokens via ``k2_pad_attribution``; "torch" aligns the full padded
    sequence and leaves blanks with the preceding token
    (align_text.py:330-349).
    """
    if method not in ("k2", "torch"):
        raise ValueError(f"unknown align method {method!r}")
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
        blank_id = mc.text_encoder.tokens
        if method == "k2":
            # inner tokens only: strip the prefix pad (position 0) and
            # mask out the suffix pad via the shortened label lengths
            inner = jnp.concatenate(
                [text[:, 1:], jnp.zeros_like(text[:, :1])], axis=1
            )
            res = ctc_forced_align(
                log_probs, lengths,
                inner, jnp.maximum(text_lengths - 2, 1),
                blank_id=blank_id,
            )
            arg_blank = jnp.argmax(log_probs, axis=-1) == blank_id
            return res, arg_blank
        res = ctc_forced_align(
            log_probs, lengths, text, text_lengths, blank_id=blank_id
        )
        return res, jnp.zeros(log_probs.shape[:2], bool)

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
            res, arg_blank = align_batch(
                jnp.asarray(batch.audio_gt), jnp.asarray(batch.text),
                jnp.asarray(batch.text_lengths),
            )
            durs = np.asarray(res.durations)
            scores = np.asarray(res.scores)
            onsets = np.asarray(res.onsets)
            arg_blank = np.asarray(arg_blank)
            frames_total = onsets.shape[1]
            for k, path in enumerate(paths):
                n = int(batch.text_lengths[k])
                if method == "k2":
                    d = k2_pad_attribution(
                        onsets[k], arg_blank[k], frames_total
                    )
                    if d.shape[0] != n:
                        # only reachable via the untrained-model fallback
                        # (no onset frames): fall back to the Viterbi
                        # inner-token attribution with zero-length pads
                        logger.warning(
                            "k2 attribution length %d != text length %d "
                            "for %s; falling back to Viterbi attribution",
                            d.shape[0], n, path,
                        )
                        d = np.concatenate(
                            [[0.0], durs[k, : n - 2], [0.0]]
                        ).astype(np.float32)
                    durations[path] = d[None, :].astype(np.float32)
                else:
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
