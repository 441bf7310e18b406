"""Text normalization / G2P / book packing tests."""

from stylish_tts_tpu.config import ModelConfig
from stylish_tts_tpu.text import TextCleaner
from stylish_tts_tpu.textproc.book import pack_utterances, split_chapters
from stylish_tts_tpu.textproc.g2p import phonemize
from stylish_tts_tpu.textproc.normalize import (
    normalize_text,
    number_to_words,
    ordinal_to_words,
    year_to_words,
)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(21) == "twenty-one"
    assert number_to_words(105) == "one hundred and five"
    assert number_to_words(1234) == (
        "one thousand two hundred and thirty-four"
    )
    assert number_to_words(-7) == "minus seven"


def test_ordinals_and_years():
    assert ordinal_to_words(1) == "first"
    assert ordinal_to_words(22) == "twenty-second"
    assert ordinal_to_words(30) == "thirtieth"
    assert year_to_words(1984) == "nineteen eighty-four"
    assert year_to_words(2005) == "two thousand and five"
    assert year_to_words(1805) == "eighteen oh five"
    assert year_to_words(2024) == "twenty twenty-four"


def test_normalize_text():
    out = normalize_text("Dr. Smith paid $3.50 on the 2nd of May 1999.")
    assert "Doctor" in out
    assert "three dollars and fifty cents" in out
    assert "second" in out
    assert "nineteen ninety-nine" in out
    assert not any(ch.isdigit() for ch in out)


def test_phonemize_fallback_in_symbol_table():
    mc = ModelConfig()
    tc = TextCleaner(mc.symbol)
    ipa = phonemize("The quick brown fox jumps over the lazy dog.")
    assert len(ipa) > 10
    ids = tc(ipa)
    # every emitted character must be tokenizable (2 pads + content)
    assert len(ids) >= len(ipa) * 0.9


def test_book_chapter_split_and_packing():
    text = (
        "Chapter 1\n"
        "It was a dark night. The wind howled. "
        "Nobody was outside.\n\nChapter 2\nMorning came."
    )
    chapters = split_chapters(text)
    assert len(chapters) == 2
    assert chapters[0].title.startswith("Chapter 1")
    assert len(chapters[0].sentences) == 3

    packed = pack_utterances(chapters[0].sentences, budget=30)
    assert all(len(p) <= 40 for p in packed)
    assert " ".join(packed).count("dark night") == 1
