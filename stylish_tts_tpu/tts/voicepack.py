"""Voicepack: precomputed style vectors for inference.

Parity with the reference voicepack (reference: train/voicepack.py:12-177):
  * styles (speech / pitch-energy / duration) encoded for every
    training segment from its style mel;
  * static pack: 512 rows indexed by token count, each the average of
    the >=100 nearest-by-text-length segment styles
    (voicepack.py:116-136);
  * dynamic pack: per-segment styles + sentence embeddings for kNN
    blending — gated on sentence-transformers availability (the model
    download needs network; reference voicepack.py:38).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..data.caches import save_cache

logger = logging.getLogger("stylish_tts_tpu")

STATIC_ROWS = 512
MIN_NEIGHBORHOOD = 100


def encode_all_styles(
    dataset, models, params, norm, model_config, batch_size: int = 8,
) -> Dict[str, np.ndarray]:
    """Per-segment style vectors: {"speech"|"pe"|"duration": (N, style_dim)},
    plus "lengths": (N,) token counts."""
    import jax

    from ..data.collate import collate_batch

    mc = model_config
    from ..dsp.mel import MelSpectrogram

    to_style_mel = MelSpectrogram(
        n_mels=mc.style_encoder.n_mels, n_fft=mc.style_encoder.n_fft,
        win_length=mc.style_encoder.win_length,
        hop_length=mc.style_encoder.hop_length, sample_rate=mc.sample_rate,
    )
    to_mel = MelSpectrogram(
        n_mels=mc.n_mels, n_fft=mc.n_fft, win_length=mc.win_length,
        hop_length=mc.hop_length, sample_rate=mc.sample_rate,
    )

    @jax.jit
    def encode(audio, pitch):
        def norm_mel(transform):
            mel = transform(audio)
            mel = (jnp.log(1e-5 + mel) - norm.mel_log_mean) / norm.mel_log_std
            frames = mel.shape[-1] - (mel.shape[-1] % 2)
            return mel[:, :, :frames]

        style_mel = norm_mel(to_style_mel)
        mel = norm_mel(to_mel)
        denorm = jnp.exp(mel * norm.mel_log_std + norm.mel_log_mean)
        energy = jnp.log(jnp.linalg.norm(denorm, axis=1) + 1e-9)
        frames = mel.shape[-1]
        speech = models["speech_style_encoder"].apply(
            params["speech_style_encoder"], style_mel
        )
        pe = models["pe_style_encoder"].apply(
            params["pe_style_encoder"], style_mel, pitch[:, :frames], energy
        )
        dur = models["duration_style_encoder"].apply(
            params["duration_style_encoder"], style_mel
        )
        return speech, pe, dur

    bins, _ = dataset.time_bins()
    speeches, pes, durs, lengths = [], [], [], []
    for time_bin, idxs in sorted(bins.items()):
        for i in range(0, len(idxs), batch_size):
            chunk = idxs[i : i + batch_size]
            items = [dataset.load_segment(j) for j in chunk]
            batch, _ = collate_batch(
                items, hop_length=mc.hop_length, require_pitch=False
            )
            s, p, d = encode(
                jnp.asarray(batch.audio_gt), jnp.asarray(batch.pitch)
            )
            speeches.append(np.asarray(s))
            pes.append(np.asarray(p))
            durs.append(np.asarray(d))
            lengths.extend(int(x) for x in batch.text_lengths)
    return {
        "speech": np.concatenate(speeches),
        "pe": np.concatenate(pes),
        "duration": np.concatenate(durs),
        "lengths": np.asarray(lengths, np.int32),
    }


def build_static_pack(styles: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """512 rows indexed by token count; row L averages the styles of the
    segments closest in text length (window grown until >=100 samples)."""
    lengths = styles["lengths"]
    n = lengths.shape[0]
    need = min(MIN_NEIGHBORHOOD, n)
    pack = {}
    for key in ("speech", "pe", "duration"):
        vecs = styles[key]
        rows = np.zeros((STATIC_ROWS, vecs.shape[1]), np.float32)
        for row in range(STATIC_ROWS):
            radius = 0
            while np.sum(np.abs(lengths - row) <= radius) < need:
                radius += 1
                if radius > STATIC_ROWS:
                    break
            sel = np.abs(lengths - row) <= radius
            rows[row] = vecs[sel].mean(axis=0)
        pack[key] = rows
    return pack


def save_static_voicepack(path: str, pack: Dict[str, np.ndarray]) -> None:
    save_cache(path, {f"static/{k}": v for k, v in pack.items()})


def build_dynamic_pack(
    styles: Dict[str, np.ndarray], texts, embed_fn
) -> Dict[str, np.ndarray]:
    """Per-segment styles + sentence embeddings (reference
    voicepack.py:97-113 make_dynamic)."""
    emb = embed_fn(list(texts)).astype(np.float32)
    return {
        "speech": styles["speech"],
        "pe": styles["pe"],
        "duration": styles["duration"],
        "embedding": emb,
    }


def save_dynamic_voicepack(path: str, pack: Dict[str, np.ndarray]) -> None:
    save_cache(path, {f"dynamic/{k}": v for k, v in pack.items()})


def load_voicepack(path: str) -> Dict[str, np.ndarray]:
    """Returns {"kind": "static"|"dynamic", ...arrays}."""
    from ..data.caches import load_cache

    raw = load_cache(path)
    if any(k.startswith("dynamic/") for k in raw):
        out = {
            k.split("/", 1)[1]: v
            for k, v in raw.items()
            if k.startswith("dynamic/")
        }
        out["kind"] = "dynamic"
        return out
    out = {
        k.split("/", 1)[1]: v for k, v in raw.items() if k.startswith("static/")
    }
    out["kind"] = "static"
    return out


def lookup_static_style(pack: Dict[str, np.ndarray], token_count: int):
    row = min(token_count, STATIC_ROWS - 1)
    return pack["speech"][row], pack["pe"][row], pack["duration"][row]


def lookup_dynamic_style(
    pack: Dict[str, np.ndarray], query_embedding: np.ndarray, k: int = 8
):
    """Blend the k nearest segments' styles by cosine similarity
    (reference tts/cli.py:67-76 kNN-blends 8 nearest SBERT styles)."""
    emb = pack["embedding"]
    q = query_embedding / (np.linalg.norm(query_embedding) + 1e-9)
    e = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sims = e @ q
    k = min(k, sims.shape[0])
    idx = np.argpartition(-sims, k - 1)[:k]
    w = np.maximum(sims[idx], 0.0) + 1e-6
    w = w / w.sum()
    blend = lambda arr: (arr[idx] * w[:, None]).sum(axis=0)
    return blend(pack["speech"]), blend(pack["pe"]), blend(pack["duration"])
