"""Formant-synthesized speech-like fixtures (zero-egress stand-in for
recorded speech).

Klatt-style source-filter synthesis: a glottal pulse train with F0
declination + jitter drives a cascade of second-order formant
resonators whose targets come from a per-phoneme table; fricatives are
spectrally shaped noise, stops are closure+burst.  The result has real
phoneme-aligned time-varying spectral structure — unlike the sine
fixtures, mel-L1 / alignment / vocoder behavior on it is meaningful.

This does not replace evaluation on recorded corpora (impossible here:
no network, no local speech data); it upgrades every e2e run from
"tones" to "speech-shaped".
"""

from __future__ import annotations

import numpy as np

# F1, F2, F3 (Hz), amplitude
VOWELS = {
    "ɑ": (730, 1090, 2440), "ɒ": (700, 1100, 2540), "æ": (660, 1720, 2410),
    "ɛ": (530, 1840, 2480), "e": (530, 1840, 2480), "ɪ": (390, 1990, 2550),
    "i": (270, 2290, 3010), "ʊ": (440, 1020, 2240), "u": (300, 870, 2240),
    "ʌ": (640, 1190, 2390), "ə": (500, 1500, 2500), "ɚ": (490, 1350, 1690),
    "ɜ": (490, 1350, 1690), "ɔ": (570, 840, 2410), "a": (730, 1090, 2440),
    "ɐ": (640, 1190, 2390), "o": (450, 800, 2830), "ʏ": (300, 1600, 2100),
}
LIQUIDS = {
    "ɹ": (310, 1060, 1380), "l": (360, 1300, 2700), "w": (290, 610, 2150),
    "j": (270, 2100, 2900), "ɫ": (380, 900, 2600),
}
NASALS = {"n": (250, 1700, 2600), "m": (250, 1000, 2200), "ŋ": (250, 1300, 2300)}
# fricatives: (center Hz, bandwidth Hz, voiced)
FRICATIVES = {
    "s": (6000, 3000, False), "z": (6000, 3000, True),
    "ʃ": (3500, 2500, False), "ʒ": (3500, 2500, True),
    "f": (4500, 4000, False), "v": (4500, 4000, True),
    "θ": (5000, 4000, False), "ð": (5000, 4000, True),
    "h": (1500, 2000, False),
}
STOPS = {"t": 4000, "d": 4000, "k": 2500, "ɡ": 2500, "g": 2500, "p": 1200,
         "b": 1200, "ʔ": 800, "ʧ": 3500, "ʤ": 3500}


def _resonator(x: np.ndarray, freq: float, bw: float, sr: int) -> np.ndarray:
    """Second-order IIR formant resonator."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2.0 * np.pi * freq / sr
    a1, a2 = 2.0 * r * np.cos(theta), -r * r
    b0 = 1.0 - 2.0 * r * np.cos(theta) + r * r
    y = np.zeros_like(x)
    y1 = y2 = 0.0
    for i in range(len(x)):  # segments are short; numpy loop is fine
        y0 = b0 * x[i] + a1 * y1 + a2 * y2
        y[i] = y0
        y2, y1 = y1, y0
    return y


def _glottal_source(f0: np.ndarray, sr: int, rng) -> np.ndarray:
    """Impulse-ish glottal pulse train following the F0 contour."""
    phase = np.cumsum(f0 / sr)
    pulses = np.diff(np.floor(phase), prepend=0.0) > 0
    src = np.zeros(len(f0))
    src[pulses] = 1.0
    # soften the pulse (one-pole lowpass twice) for a -12dB/oct source
    for _ in range(2):
        src = np.convolve(src, [0.7, 0.3], mode="same")
    src += 0.01 * rng.standard_normal(len(f0))  # aspiration floor
    return src


def synth_phoneme(ph: str, dur_s: float, f0_seg: np.ndarray, sr: int, rng):
    n = len(f0_seg)
    if ph in (" ", "$", ",", ".", "?", "!"):
        return 0.002 * rng.standard_normal(n)
    if ph in STOPS:
        out = 0.001 * rng.standard_normal(n)
        burst_len = max(int(0.012 * sr), 1)
        burst = rng.standard_normal(burst_len)
        burst = _resonator(burst, STOPS[ph], 1500.0, sr)
        start = max(n - burst_len - int(0.01 * sr), 0)
        out[start:start + len(burst)] += 2.0 * burst
        return out
    if ph in FRICATIVES:
        center, bw, voiced_f = FRICATIVES[ph]
        noise = rng.standard_normal(n)
        out = _resonator(noise, min(center, sr / 2 - 500), bw, sr) * 1.5
        if voiced_f:
            out = 0.6 * out + 0.8 * _resonator(
                _glottal_source(f0_seg, sr, rng), 300, 120, sr
            )
        return out
    table = {**VOWELS, **LIQUIDS, **NASALS}
    formants = table.get(ph, VOWELS["ə"])
    src = _glottal_source(f0_seg, sr, rng)
    out = np.zeros(n)
    for amp, (freq, bw) in zip(
        (1.0, 0.63, 0.35),
        zip(formants, (90.0, 110.0, 170.0)),
    ):
        out += amp * _resonator(src, freq, bw, sr)
    if ph in NASALS:
        out *= 0.5
    return out


def synth_utterance(
    phonemes: str, sr: int = 24000, seed: int = 0,
    f0_start: float = 140.0, f0_end: float = 95.0,
    target_s: float | None = None,
):
    """IPA string -> (audio float32, per-phoneme durations in samples,
    per-sample F0).  Returns speech-shaped audio at ~-20 dBFS RMS.
    ``target_s`` rescales phoneme durations to hit a total duration
    (bounds the duration-bin count -> compile count in e2e runs)."""
    rng = np.random.default_rng(seed)
    durs = []
    for ph in phonemes:
        if ph in STOPS:
            d = rng.uniform(0.05, 0.09)
        elif ph == " ":
            d = rng.uniform(0.06, 0.12)
        elif ph in ("ˈ", "ˌ", "ː"):
            d = 0.0  # modifiers carry no audio of their own
        else:
            d = rng.uniform(0.06, 0.14)
        durs.append(int(d * sr))
    if target_s is not None:
        scale = target_s * sr / max(sum(durs), 1)
        durs = [int(d * scale) for d in durs]
    total = sum(durs)
    decl = np.linspace(f0_start, f0_end, total)
    vib = 3.0 * np.sin(2 * np.pi * 5.0 * np.arange(total) / sr)
    jitter = np.repeat(
        rng.normal(0, 2.0, total // 240 + 1), 240
    )[:total]
    f0 = decl + vib + jitter

    audio = np.zeros(total, np.float32)
    pos = 0
    fade = int(0.008 * sr)
    for ph, d in zip(phonemes, durs):
        if d == 0:
            continue
        seg = synth_phoneme(ph, d / sr, f0[pos:pos + d], sr, rng)
        env = np.ones(d)
        k = min(fade, d // 2)
        if k > 0:
            env[:k] = np.linspace(0, 1, k)
            env[-k:] = np.linspace(1, 0, k)
        audio[pos:pos + d] += (seg * env).astype(np.float32)
        pos += d
    rms = float(np.sqrt(np.mean(np.square(audio))) + 1e-9)
    audio *= 0.1 / rms
    return np.clip(audio, -0.99, 0.99), np.asarray(durs), f0


SYLLABLE_ONSETS = list("tdkspbfvzmnlwjh") + ["ʃ", "ɹ", "ð", "θ"]
SYLLABLE_NUCLEI = list(VOWELS.keys())
SYLLABLE_CODAS = ["", "n", "m", "s", "t", "k", "l", "z", ""]


def random_phrase(rng, n_words=(2, 4)) -> str:
    """Random CV(C) syllable phrase over the synthesizer inventory."""
    words = []
    for _ in range(int(rng.integers(n_words[0], n_words[1] + 1))):
        syls = []
        for _ in range(int(rng.integers(1, 4))):
            syl = str(rng.choice(SYLLABLE_ONSETS)) + str(rng.choice(SYLLABLE_NUCLEI))
            syl += str(rng.choice(SYLLABLE_CODAS))
            syls.append(syl)
        words.append("".join(syls))
    return " ".join(words)
