from .safetensors_io import (
    load_vae_params,
    save_vae_pretrained,
    flax_params_from_torch_state,
    torch_state_from_flax_params,
)
from .torch_bin import load_decoder_params, save_decoder_bin

__all__ = [
    "load_vae_params",
    "save_vae_pretrained",
    "flax_params_from_torch_state",
    "torch_state_from_flax_params",
    "load_decoder_params",
    "save_decoder_bin",
]
