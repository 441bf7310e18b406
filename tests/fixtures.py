"""Runnable micro-dataset fixture (the reference's sample_dataset is
documentation-only with an empty wav dir — SURVEY.md §4; ours runs)."""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from stylish_tts_tpu.data.caches import save_cache
from stylish_tts_tpu.data.dataset import get_frame_count, get_time_bin
from stylish_tts_tpu.data.wav import write_wav

PHONEME_SETS = [
    "ɔnðə kˈɑːntɹɛɹi",
    "fɚðə fˈɜːst tˈaɪm",
    "æz tˈaɪm pˈæst",
    "ðɪ ˈɜːli jˈɪɹz",
    "hˈɑːɹdli ˈɛnɪwˌʌn",
    "wˈʌn dˈeɪ",
]


def make_micro_dataset(
    root: str, n_train: int = 6, n_val: int = 2, sample_rate: int = 24000,
    hop: int = 300, with_caches: bool = True, seed: int = 0,
    uniform_duration: bool = False, voice: str = "sine",
    target_s_choices=None, time_bin_quantize: int = 1,
):
    """Create wav-dir + train/val lists (+ pitch & alignment caches).

    voice="formant" synthesizes speech-shaped audio (glottal source +
    formant resonators per phoneme, tests/formant_speech.py) with
    ground-truth per-phoneme durations in the align cache; "sine" keeps
    the fast chirp fixtures.

    target_s_choices: optional list of formant utterance lengths in
    seconds, cycled per segment — a multi-bin corpus for the
    compile-budget experiments (default: the two-bin 1.1/1.45 s fast
    fixture)."""
    rng = np.random.default_rng(seed)
    wav_dir = osp.join(root, "wav-dir")
    os.makedirs(wav_dir, exist_ok=True)

    gt_align = {}

    def make_split(n, prefix, offset):
        lines = []
        pitch_cache = {}
        align_cache = {}
        for i in range(n):
            phonemes = PHONEME_SETS[(i + offset) % len(PHONEME_SETS)]
            if voice == "formant":
                from formant_speech import random_phrase, synth_utterance

                if i + offset >= len(PHONEME_SETS):
                    phonemes = random_phrase(
                        np.random.default_rng(seed * 7919 + offset + i)
                    )
                if target_s_choices:
                    target_s = target_s_choices[
                        (i + offset) % len(target_s_choices)
                    ]
                else:
                    # two duration bins -> two compiled programs per stage
                    target_s = 1.1 if (i + offset) % 2 else 1.45
                audio, ph_durs, f0_samples = synth_utterance(
                    phonemes, sample_rate, seed=seed * 1000 + offset + i,
                    f0_start=float(rng.uniform(120, 180)),
                    target_s=target_s,
                )
                samples = len(audio)
            else:
                # audio duration: 0.9-1.6 s (bins 2..4); uniform -> one bin
                # (one compiled program per stage, fast CPU smoke)
                if uniform_duration:
                    dur_s = 0.9
                else:
                    dur_s = 0.9 + 0.15 * ((i + offset) % 5)
                samples = int(dur_s * sample_rate)
                t = np.arange(samples) / sample_rate
                f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 1.3 * t)
                audio = 0.4 * np.sin(2 * np.pi * np.cumsum(f0) / sample_rate)
                audio += 0.05 * rng.standard_normal(samples)
            name = f"{prefix}{i}.wav"
            write_wav(osp.join(wav_dir, name), audio, sample_rate)
            lines.append(f"{name}|{phonemes}|0|sample text {i}")
            if with_caches:
                time_bin = get_time_bin(samples, hop, time_bin_quantize)
                frames = get_frame_count(time_bin)
                n_tok = len(phonemes) + 2  # tokenizer adds 2 pads
                if voice == "formant":
                    idx = np.minimum(
                        np.arange(frames) * hop, samples - 1
                    )
                    pitch_cache[name] = f0_samples[idx].astype(np.float32)
                    # ground-truth durations from the synthesizer, padded
                    # tokens absorb the frame remainder
                    durs = np.zeros(n_tok, np.float32)
                    scaled = ph_durs / hop
                    durs[1:-1] = scaled
                    total = float(durs.sum())
                    durs[0] = max((frames - total) / 2, 0)
                    durs[-1] = max(frames - total - durs[0], 0)
                    align_cache[name] = durs[None, :]
                    gt_align[name] = durs[None, :].copy()
                else:
                    pf = 120.0 + 30.0 * np.sin(
                        2 * np.pi * 1.3 * np.arange(frames) * hop / sample_rate
                    )
                    pitch_cache[name] = pf.astype(np.float32)
                    base = frames // n_tok
                    durs = np.full(n_tok, base, np.float32)
                    durs[-1] += frames - base * n_tok
                    align_cache[name] = durs[None, :]
        return lines, pitch_cache, align_cache

    train_lines, train_pitch, train_align = make_split(n_train, "tr", 0)
    val_lines, val_pitch, val_align = make_split(n_val, "va", 3)

    with open(osp.join(root, "train-list.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(train_lines) + "\n")
    with open(osp.join(root, "val-list.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(val_lines) + "\n")
    if with_caches:
        save_cache(osp.join(root, "pitch.safetensors"),
                   {**train_pitch, **val_pitch})
        save_cache(osp.join(root, "alignment.safetensors"),
                   {**train_align, **val_align})
    if gt_align:
        # synthesizer ground-truth durations, kept separate so the real
        # `align` pipeline output can be scored against them
        save_cache(osp.join(root, "gt_alignment.safetensors"), gt_align)
    return root
