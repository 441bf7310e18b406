from . import package
from .package import export_checkpoint, InferencePackage

__all__ = ["package", "export_checkpoint", "InferencePackage"]
