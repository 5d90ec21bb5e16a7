"""Configuration dataclasses.

The reference configures the VAE with a diffusers-style JSON dict
(``/root/reference/diffusers_vae_loader.py:102-134``) and each entry point with
~50 duplicated argparse flags.  Here one frozen dataclass per subsystem is the
single source of truth; the CLI layer (scripts/) builds these from
reference-compatible flags.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """FLUX AutoencoderKL architecture config.

    Field names and defaults mirror the diffusers config the reference pins at
    ``/root/reference/diffusers_vae_loader.py:102-134`` so existing JSON config
    files load unchanged.
    """

    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Sequence[str] = ("DownEncoderBlock2D",) * 4
    up_block_types: Sequence[str] = ("UpDecoderBlock2D",) * 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    act_fn: str = "silu"
    latent_channels: int = 16
    norm_num_groups: int = 32
    sample_size: int = 1024
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    use_quant_conv: bool = False
    use_post_quant_conv: bool = False
    force_upcast: bool = True
    mid_block_add_attention: bool = True

    @property
    def num_down_blocks(self) -> int:
        return len(self.down_block_types)

    @property
    def downsample_factor(self) -> int:
        # one stride-2 downsample between consecutive encoder stages
        return 2 ** (self.num_down_blocks - 1)

    def to_json_dict(self) -> dict:
        """Diffusers-layout config dict (for save_pretrained-style export)."""
        return {
            "_class_name": "AutoencoderKL",
            "_diffusers_version": "0.30.0.dev0",
            "act_fn": self.act_fn,
            "block_out_channels": list(self.block_out_channels),
            "down_block_types": list(self.down_block_types),
            "force_upcast": self.force_upcast,
            "in_channels": self.in_channels,
            "latent_channels": self.latent_channels,
            "latents_mean": None,
            "latents_std": None,
            "layers_per_block": self.layers_per_block,
            "mid_block_add_attention": self.mid_block_add_attention,
            "norm_num_groups": self.norm_num_groups,
            "out_channels": self.out_channels,
            "sample_size": self.sample_size,
            "scaling_factor": self.scaling_factor,
            "shift_factor": self.shift_factor,
            "up_block_types": list(self.up_block_types),
            "use_post_quant_conv": self.use_post_quant_conv,
            "use_quant_conv": self.use_quant_conv,
        }


def default_flux_vae_config(**overrides) -> VAEConfig:
    """The hardcoded FLUX.1-dev VAE config (diffusers_vae_loader.py:102-134)."""
    return dataclasses.replace(VAEConfig(), **overrides)


def default_sd_vae_config(**overrides) -> VAEConfig:
    """The SD 1.x/2.x VAE family (e.g. sd-vae-ft-mse): 4-channel latents,
    1x1 quant convs around the latent space, scaling 0.18215, no shift.
    The reference inherits this family through diffusers'
    ``AutoencoderKL(**config)`` (create_vae_from_config_file)."""
    base = dict(latent_channels=4, sample_size=256, scaling_factor=0.18215,
                shift_factor=0.0, use_quant_conv=True,
                use_post_quant_conv=True)
    base.update(overrides)
    return dataclasses.replace(VAEConfig(), **base)


_VAE_FIELDS = {f.name for f in dataclasses.fields(VAEConfig)}


# diffusers AutoencoderKL constructor defaults for keys a config JSON may
# omit: SD-era configs (e.g. sd-vae-ft-mse) predate the quant-conv flags and
# the shift factor, and diffusers fills them in at construction
# (AutoencoderKL(**config), which is exactly what the reference's
# create_vae_from_config_file does).  The VAEConfig dataclass defaults above
# are the FLUX pin instead — the reference's FLUX config JSON sets all four
# keys EXPLICITLY, so FLUX files are unaffected by these fallbacks.
_DIFFUSERS_JSON_DEFAULTS = {
    "use_quant_conv": True,
    "use_post_quant_conv": True,
    "scaling_factor": 0.18215,
    "shift_factor": 0.0,  # diffusers' None == no shift
}


def vae_config_from_dict(d: dict) -> VAEConfig:
    """Build a VAEConfig from a diffusers-style JSON dict, ignoring extras
    (``_class_name``, ``latents_mean`` etc.) like diffusers does; keys the
    JSON omits (or sets null) get diffusers' constructor defaults so SD-era
    configs load with the same architecture diffusers would build."""
    kwargs = {}
    for k, v in d.items():
        if k in _VAE_FIELDS:
            if isinstance(v, list):
                v = tuple(v)
            if v is None and k in _DIFFUSERS_JSON_DEFAULTS:
                continue  # treat null like an absent key
            kwargs[k] = v
    for k, v in _DIFFUSERS_JSON_DEFAULTS.items():
        kwargs.setdefault(k, v)
    return VAEConfig(**kwargs)


def vae_config_from_file(path: str) -> VAEConfig:
    with open(path, "r", encoding="utf-8") as f:
        return vae_config_from_dict(json.load(f))


def get_vae_latent_info(resolution: int, latent_channels: int = 16,
                        downsample_factor: int = 8) -> dict:
    """Latent geometry for a given input resolution.

    Mirrors ``/root/reference/modules.py:244-254`` (factor 8 for the FLUX
    config); pass ``config.downsample_factor`` for non-default block counts.
    """
    latent_height = resolution // downsample_factor
    latent_width = resolution // downsample_factor
    return {
        "latent_channels": latent_channels,
        "latent_height": latent_height,
        "latent_width": latent_width,
        "total_dim": latent_channels * latent_height * latent_width,
    }


@dataclasses.dataclass(frozen=True)
class AttentionDecoderConfig:
    """Config for the attention tagger head.

    Mirrors the ``attention_config`` dict assembled at
    ``/root/reference/train_full.py:65-71`` plus the structural params of
    ``AttentionClassificationDecoder`` (``/root/reference/modules.py:358-422``).
    """

    use_spatial_attention: bool = True
    use_self_attention: bool = True
    use_cross_attention: bool = False
    attention_heads: int = 8
    attention_dropout: float = 0.1
