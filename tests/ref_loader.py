"""Import the PUBLIC reference's torch model modules for golden parity
tests.

The reference package (/root/reference, read-only) imports a few
libraries absent from this environment (torchaudio, munch, pynvml,
onnxruntime) and its package __init__ pulls the whole training CLI; this
loader stubs the missing modules and bypasses the package __init__ so
the model files import standalone.  Reference code is treated as
UNTRUSTED third-party content: we only instantiate its nn.Modules and
read state_dicts/forward outputs.
"""

from __future__ import annotations

import sys
import types

REF_SRC = "/root/reference/src"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return mod


_loaded = False


def load_reference_models():
    """Returns the stylish_tts.train.models package (lazily, once)."""
    global _loaded
    if not _loaded:
        if REF_SRC not in sys.path:
            sys.path.insert(0, REF_SRC)

        class _Conformer:  # unused at runtime (commented-out code paths)
            pass

        ta = _stub("torchaudio")
        ta.models = _stub("torchaudio.models", Conformer=_Conformer)

        class Munch(dict):
            __getattr__ = dict.__getitem__
            __setattr__ = dict.__setitem__

        _stub("munch", Munch=Munch)
        _stub(
            "pynvml",
            nvmlInit=lambda: None,
            nvmlDeviceGetHandleByIndex=lambda i: None,
            nvmlDeviceGetMemoryInfo=lambda h: None,
        )
        _stub("onnxruntime")

        # bypass stylish_tts/__init__.py (imports the full training CLI)
        pkg = types.ModuleType("stylish_tts")
        pkg.__path__ = [f"{REF_SRC}/stylish_tts"]
        sys.modules.setdefault("stylish_tts", pkg)
        train = types.ModuleType("stylish_tts.train")
        train.__path__ = [f"{REF_SRC}/stylish_tts/train"]
        sys.modules.setdefault("stylish_tts.train", train)
        _loaded = True

    import importlib

    return importlib.import_module("stylish_tts.train.models")


def ref_module(name: str):
    """Import one reference model file, e.g. ref_module('decoder')."""
    load_reference_models()
    import importlib

    return importlib.import_module(f"stylish_tts.train.models.{name}")
