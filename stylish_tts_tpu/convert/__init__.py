"""Torch-checkpoint import: fold reference parametrizations and map
trained PyTorch weights (Stylish-TTS reference) onto the flax models.

Entry points:
  * folding.fold_state_dict — bake weight-norm / spectral-norm /
    BatchNorm-eval parametrizations into plain tensors.
  * torch_import.convert_<module> — per-module torch->flax parameter
    conversion (layout transposes + name mapping).
"""

from .folding import fold_state_dict
from . import torch_import

__all__ = ["fold_state_dict", "torch_import"]
