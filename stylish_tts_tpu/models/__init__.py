from . import (
    common,
    conformer,
    convnext,
    decoder,
    discriminators,
    duration_predictor,
    generator,
    pitch_energy_predictor,
    prosody_encoder,
    speech_predictor,
    style_encoder,
    text_aligner,
    text_encoder,
    text_style_encoder,
)
from .models import build_model, MODEL_NAMES

__all__ = ["build_model", "MODEL_NAMES"]
