"""ctypes binding for the native batched WAV loader.

Builds libstylish_io.so on first use (make; g++ is part of the image);
falls back to the scipy path in data/wav.py when the toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import os.path as osp
import subprocess
from typing import List, Optional

import numpy as np

logger = logging.getLogger("stylish_tts_tpu")

_HERE = osp.dirname(__file__)
_LIB_PATH = osp.join(_HERE, "libstylish_io.so")
_lib = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not osp.isfile(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s", "-C", _HERE], check=True, capture_output=True
            )
        except Exception as exc:
            logger.warning("native loader build failed (%s); using scipy", exc)
            _build_failed = True
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.stylish_load_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
    ]
    lib.stylish_load_wav_batch.restype = None
    lib.stylish_wav_frames.argtypes = [ctypes.c_char_p, ctypes.c_int32]
    lib.stylish_wav_frames.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def load_wav_batch(
    paths: List[str], target_sr: int, target_len: int, n_threads: int = 0
) -> np.ndarray:
    """Load + resample + center-pad a batch -> (n, target_len) float32."""
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.zeros((n, target_len), np.float32)
    statuses = np.zeros((n,), np.int32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.stylish_load_wav_batch(
        c_paths, n, target_sr, target_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    bad = [paths[i] for i in range(n) if statuses[i] < 0]
    if bad:
        raise IOError(f"native loader failed for: {bad}")
    return out


def wav_frames(path: str, target_sr: int) -> int:
    lib = _ensure_built()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    return int(lib.stylish_wav_frames(path.encode(), target_sr))
