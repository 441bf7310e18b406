"""Model registry: the 13 named modules of the framework.

Mirrors the reference build_model inventory
(reference: train/models/models.py:29-85): text_aligner,
duration_predictor, pitch_energy_predictor, speech_predictor, disc,
mrd0..2, speech_style_encoder, pe_style_encoder,
duration_style_encoder, pitch_disc, dur_disc.

Returns flax module definitions; parameters are initialized separately
(pure-functional — init shapes come from the bucket plan).
"""

from __future__ import annotations

from typing import Dict

from flax import linen as nn

from ..config import ModelConfig
from .discriminators import (
    ContextFreeDiscriminator,
    PitchDiscriminator,
    SpecDiscriminator,
)
from .duration_predictor import DurationPredictor
from .pitch_energy_predictor import PitchEnergyPredictor
from .speech_predictor import SpeechPredictor
from .style_encoder import MelStyleEncoder, PitchStyleEncoder
from .text_aligner import TextAligner

MODEL_NAMES = [
    "text_aligner",
    "duration_predictor",
    "pitch_energy_predictor",
    "speech_predictor",
    "disc",
    "mrd0",
    "mrd1",
    "mrd2",
    "speech_style_encoder",
    "pe_style_encoder",
    "duration_style_encoder",
    "pitch_disc",
    "dur_disc",
]

DISCRIMINATOR_NAMES = ["mrd0", "mrd1", "mrd2", "disc", "pitch_disc", "dur_disc"]


def build_model(model_config: ModelConfig) -> Dict[str, nn.Module]:
    mc = model_config
    # Imported torch checkpoints run BatchNorm sites as frozen affine and
    # take spectral-norm kernels as pre-folded (see convert/torch_import.py).
    norm_mode = "affine" if mc.imported_weights else "group"
    sn = not mc.imported_weights
    if mc.imported_weights:
        mc.generator.norm_mode = "affine"
    # generator.remat also remats the audio/spec discriminators: their
    # wide fp-padded activations dominate HBM in the adversarial phase
    Spec = nn.remat(SpecDiscriminator) if mc.generator.remat else SpecDiscriminator
    CtxFree = (
        nn.remat(ContextFreeDiscriminator)
        if mc.generator.remat
        else ContextFreeDiscriminator
    )
    return {
        "text_aligner": TextAligner(
            n_mels=mc.text_aligner.n_mels,
            n_tokens=mc.text_encoder.tokens,
            norm_mode=norm_mode,
        ),
        "duration_predictor": DurationPredictor(
            style_dim=mc.style_dim,
            inter_dim=mc.inter_dim,
            text_config=mc.text_encoder,
            duration_config=mc.duration_predictor,
        ),
        "pitch_energy_predictor": PitchEnergyPredictor(
            style_dim=mc.style_dim,
            inter_dim=mc.pitch_energy_predictor.inter_dim,
            text_config=mc.text_encoder,
            duration_config=mc.duration_predictor,
            pe_config=mc.pitch_energy_predictor,
        ),
        "speech_predictor": SpeechPredictor(model_config=mc),
        "disc": CtxFree(norm_mode=norm_mode),
        "mrd0": Spec(),
        "mrd1": Spec(),
        "mrd2": Spec(),
        "speech_style_encoder": MelStyleEncoder(
            dim_in=mc.style_encoder.n_mels,
            style_dim=mc.style_dim,
            max_conv_dim=mc.style_encoder.max_channels,
            skip_last_downsample=mc.style_encoder.skip_downsample,
            sn=sn,
        ),
        "pe_style_encoder": PitchStyleEncoder(
            dim_in=mc.style_encoder.n_mels,
            style_dim=mc.style_dim,
            max_conv_dim=mc.style_encoder.max_channels,
            skip_last_downsample=mc.style_encoder.skip_downsample,
            coarse_multiplier=mc.coarse_multiplier,
            sn=sn,
        ),
        "duration_style_encoder": MelStyleEncoder(
            dim_in=mc.style_encoder.n_mels,
            style_dim=mc.style_dim,
            max_conv_dim=mc.style_encoder.max_channels,
            skip_last_downsample=mc.style_encoder.skip_downsample,
            sn=sn,
        ),
        "pitch_disc": PitchDiscriminator(dim_hidden=64, kernel=21),
        "dur_disc": PitchDiscriminator(dim_hidden=64, kernel=5),
    }
