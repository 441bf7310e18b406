"""Grapheme-to-phoneme conversion.

Equivalent of the reference's espeak-backed phonemization
(reference: lib/ttab/phonemes.py): uses the `espeak-ng`/`espeak`
binary when present (same backend the reference's fixups target);
otherwise falls back to a self-contained rule-based English
letter-to-IPA mapper so the pipeline stays runnable in hermetic
environments.  The fallback is intentionally simple — training-grade
phonemes should come from a real G2P; the fallback keeps tooling and
tests alive.
"""

from __future__ import annotations

import re
import shutil
import subprocess
from typing import Optional

_ESPEAK: Optional[str] = shutil.which("espeak-ng") or shutil.which("espeak")

# Reference-style espeak output fixups (lib/ttab/phonemes.py applies
# similar replacements to map espeak output into the symbol table).
_ESPEAK_FIXUPS = [
    ("ɚ", "ɚ"),
    ("ɾ", "ɾ"),
    ("\n", " "),
]

# rule-based fallback: digraphs first, then single letters
_DIGRAPHS = [
    ("tch", "ʧ"), ("sch", "sk"), ("ch", "ʧ"), ("sh", "ʃ"), ("th", "θ"),
    ("ph", "f"), ("wh", "w"), ("ck", "k"), ("ng", "ŋ"), ("qu", "kw"),
    ("oo", "uː"), ("ee", "iː"), ("ea", "iː"), ("ou", "aʊ"), ("ow", "aʊ"),
    ("ai", "eɪ"), ("ay", "eɪ"), ("oi", "ɔɪ"), ("oy", "ɔɪ"), ("ar", "ɑːɹ"),
    ("er", "ɚ"), ("ir", "ɜː"), ("or", "ɔːɹ"), ("ur", "ɜː"),
]
_SINGLES = {
    "a": "æ", "b": "b", "c": "k", "d": "d", "e": "ɛ", "f": "f", "g": "ɡ",
    "h": "h", "i": "ɪ", "j": "ʤ", "k": "k", "l": "l", "m": "m", "n": "n",
    "o": "ɑː", "p": "p", "q": "k", "r": "ɹ", "s": "s", "t": "t", "u": "ʌ",
    "v": "v", "w": "w", "x": "ks", "y": "j", "z": "z",
}
_KEEP = set(';:,.!?¡¿—…"()“” ')


def espeak_available() -> bool:
    return _ESPEAK is not None


def _phonemize_espeak(text: str, voice: str = "en-us") -> str:
    out = subprocess.run(
        [_ESPEAK, "-q", "--ipa=3", "-v", voice, text],
        capture_output=True, text=True, check=True,
    ).stdout
    for a, b in _ESPEAK_FIXUPS:
        out = out.replace(a, b)
    out = out.replace("_", "")
    return re.sub(r"\s+", " ", out).strip()


def _phonemize_rules(text: str) -> str:
    words = []
    for token in re.findall(r"[a-zA-Z']+|[^a-zA-Z']", text.lower()):
        if not token.strip() or not token[0].isalpha():
            if token in _KEEP or token == " ":
                words.append(token)
            continue
        word = token.replace("'", "")
        out = ""
        i = 0
        while i < len(word):
            for pattern, ipa in _DIGRAPHS:
                if word.startswith(pattern, i):
                    out += ipa
                    i += len(pattern)
                    break
            else:
                out += _SINGLES.get(word[i], "")
                i += 1
        # final silent e
        if word.endswith("e") and len(word) > 2 and out.endswith("ɛ"):
            out = out[:-1]
        words.append(out)
    return "".join(words)


def _phonemize_plain(text: str, voice: str = "en-us") -> str:
    if _ESPEAK is not None:
        try:
            return _phonemize_espeak(text, voice)
        except Exception:
            pass
    return _phonemize_rules(text)


def phonemize(text: str, voice: str = "en-us") -> str:
    """Plain text -> IPA phoneme string (symbol-table compatible).

    Heteronyms are resolved by POS context first (textproc/homographs.py,
    the hermetic counterpart of the reference's ModernBERT disambiguator,
    lib/ttab/homographs.py:17) and their IPA spliced around the backend
    G2P output."""
    from .homographs import pronunciation_overrides

    overrides = pronunciation_overrides(text)
    if not overrides:
        return _phonemize_plain(text, voice)
    parts = []
    pos = 0
    for start, end, ipa in overrides:
        chunk = text[pos:start]
        if chunk.strip():
            parts.append(_phonemize_plain(chunk, voice))
        elif chunk:
            parts.append(" " if " " in chunk else "")
        parts.append(ipa)
        pos = end
    tail = text[pos:]
    if tail.strip():
        parts.append(_phonemize_plain(tail, voice))
    out = ""
    for part in parts:
        if out and part and not out.endswith(" ") and not part.startswith(" "):
            out += " "
        out += part
    return re.sub(r"\s+", " ", out).strip()
