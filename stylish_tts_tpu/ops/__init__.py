from . import ctc, duration
from .duration import DurationProcessor
from .ctc import ctc_loss_with_priors, ctc_forced_align

__all__ = [
    "ctc",
    "duration",
    "DurationProcessor",
    "ctc_loss_with_priors",
    "ctc_forced_align",
]
