"""Flat safetensors IO for flax param pytrees.

Used for the standalone alignment-model artifact
(reference: train/train.py:445-450 saves alignment_model.safetensors)
and for export weight bundles.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from safetensors.numpy import load_file, save_file


def save_params_safetensors(path: str, params: Any) -> None:
    flat = flatten_dict(jax.tree.map(np.asarray, params), sep="/")
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, path)


def load_params_safetensors(path: str) -> Dict:
    flat = load_file(path)
    return unflatten_dict(flat, sep="/")
