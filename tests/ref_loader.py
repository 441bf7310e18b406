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
    import importlib.machinery

    mod = types.ModuleType(name)
    # a real ModuleSpec: torch._dynamo walks sys.modules with find_spec,
    # which raises on __spec__ = None
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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

        class _Resample:  # rmvpe/inference.py:4 (unused in tests)
            def __init__(self, *a, **k):
                pass

        ta = _stub("torchaudio")
        ta.models = _stub("torchaudio.models", Conformer=_Conformer)
        ta.transforms = _stub("torchaudio.transforms", Resample=_Resample)
        ta.__path__ = []  # mark as package so submodule imports resolve

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
        # dataloader.py:4 — imported transitively by loss_log/train_context;
        # the trajectory-parity harness never touches file IO
        _stub(
            "soundfile",
            read=None,
            info=None,
            write=None,
        )

        # librosa: only filters.mel is used (rmvpe/spec.py:4); provide the
        # equivalent htk+slaney filterbank so the reference model imports.
        def _librosa_mel(*, sr, n_fft, n_mels, fmin, fmax, htk=False):
            assert htk, "stub supports htk=True only"
            import numpy as np

            from stylish_tts_tpu.dsp.mel import mel_filterbank

            fb = mel_filterbank(n_mels, n_fft, sr, f_min=fmin, f_max=fmax)

            def h2m(f):
                return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)

            def m2h(m):
                return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)

            pts = m2h(np.linspace(h2m(fmin), h2m(fmax), n_mels + 2))
            enorm = 2.0 / (pts[2:] - pts[:-2])
            return (fb * enorm[None, :]).T.astype(np.float32)  # (n_mels, freq)

        lib = _stub("librosa")
        lib.filters = _stub("librosa.filters", mel=_librosa_mel)

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
