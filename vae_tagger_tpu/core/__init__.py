from .precision import Policy, resolve_mixed_precision
from .config import (
    VAEConfig,
    AttentionDecoderConfig,
    default_flux_vae_config,
    default_sd_vae_config,
    vae_config_from_dict,
    get_vae_latent_info,
)

__all__ = [
    "Policy",
    "resolve_mixed_precision",
    "VAEConfig",
    "AttentionDecoderConfig",
    "default_flux_vae_config",
    "default_sd_vae_config",
    "vae_config_from_dict",
    "get_vae_latent_info",
]
