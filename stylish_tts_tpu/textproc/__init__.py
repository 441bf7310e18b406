from . import book, g2p, normalize
from .normalize import normalize_text
from .g2p import phonemize

__all__ = ["book", "g2p", "normalize", "normalize_text", "phonemize"]
