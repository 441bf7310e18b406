from . import stft, mel, multi_spectrogram
from .stft import STFTParams
from .mel import MelSpectrogram, calculate_mel, log_mel, mel_filterbank
from .multi_spectrogram import MultiSpectrogram, RESOLUTIONS

__all__ = [
    "stft",
    "mel",
    "multi_spectrogram",
    "STFTParams",
    "MelSpectrogram",
    "calculate_mel",
    "log_mel",
    "mel_filterbank",
    "MultiSpectrogram",
    "RESOLUTIONS",
]
