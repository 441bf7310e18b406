from . import params_io
from .params_io import save_params_safetensors, load_params_safetensors

__all__ = ["params_io", "save_params_safetensors", "load_params_safetensors"]
