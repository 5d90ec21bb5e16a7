"""diffusers.models.AutoencoderKL shim over the repo's torch oracle.

API surface the reference actually uses (diffusers_vae_loader.py:7-53,
67-94): ``AutoencoderKL(**config)``; ``.load_state_dict(sd, strict=False)``
with diffusers-layout keys; ``.encode(x).latent_dist`` with
``.mode()/.sample()/.kl()``; ``.decode(z).sample``; ``.config.<attr>``.
DiagonalGaussianDistribution follows diffusers semantics (logvar clamped
to [-30, 20]).
"""

from __future__ import annotations

import os
import sys
from types import SimpleNamespace

import torch

# the oracle lives in the repo's test tree (tests/torch_oracle)
_TESTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "..", "..", "..", "tests")
if os.path.abspath(_TESTS) not in [os.path.abspath(p) for p in sys.path]:
    sys.path.insert(0, os.path.abspath(_TESTS))

from torch_oracle.vae_torch import AutoencoderKLOracle  # noqa: E402


class DiagonalGaussianDistribution:
    def __init__(self, parameters: torch.Tensor):
        self.parameters = parameters
        mean, logvar = torch.chunk(parameters, 2, dim=1)
        self.mean = mean
        self.logvar = torch.clamp(logvar, -30.0, 20.0)
        self.std = torch.exp(0.5 * self.logvar)
        self.var = torch.exp(self.logvar)

    def sample(self, generator=None) -> torch.Tensor:
        noise = torch.randn(self.mean.shape, generator=generator,
                            dtype=self.mean.dtype, device=self.mean.device)
        return self.mean + self.std * noise

    def mode(self) -> torch.Tensor:
        return self.mean

    def kl(self, other=None) -> torch.Tensor:
        return 0.5 * torch.sum(self.mean.pow(2) + self.var - 1.0
                               - self.logvar, dim=[1, 2, 3])


class AutoencoderKL(AutoencoderKLOracle):
    """Constructor-compatible with the kwargs the reference passes
    (diffusers_vae_loader.py:8-35); structural kwargs the oracle does not
    parameterize (block types, act_fn) are validated instead of ignored."""

    def __init__(self, in_channels=3, out_channels=3, down_block_types=None,
                 up_block_types=None, block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2, act_fn="silu", latent_channels=16,
                 norm_num_groups=32, sample_size=1024, scaling_factor=0.3611,
                 shift_factor=0.1159, use_quant_conv=False,
                 use_post_quant_conv=False, force_upcast=True,
                 mid_block_add_attention=True, **extra):
        if act_fn != "silu":
            raise NotImplementedError(f"shim supports act_fn='silu', "
                                      f"got {act_fn!r}")
        for t in (down_block_types or []):
            assert t == "DownEncoderBlock2D", t
        for t in (up_block_types or []):
            assert t == "UpDecoderBlock2D", t
        super().__init__(in_channels=in_channels, out_channels=out_channels,
                         block_out_channels=tuple(block_out_channels),
                         layers_per_block=layers_per_block,
                         latent_channels=latent_channels,
                         norm_num_groups=norm_num_groups,
                         add_attention=mid_block_add_attention,
                         use_quant_conv=use_quant_conv,
                         use_post_quant_conv=use_post_quant_conv)
        self.config = SimpleNamespace(
            in_channels=in_channels, out_channels=out_channels,
            block_out_channels=tuple(block_out_channels),
            layers_per_block=layers_per_block, act_fn=act_fn,
            latent_channels=latent_channels,
            norm_num_groups=norm_num_groups, sample_size=sample_size,
            scaling_factor=scaling_factor, shift_factor=shift_factor,
            use_quant_conv=use_quant_conv,
            use_post_quant_conv=use_post_quant_conv,
            force_upcast=force_upcast,
            mid_block_add_attention=mid_block_add_attention, **extra)

    def encode(self, x):
        return SimpleNamespace(
            latent_dist=DiagonalGaussianDistribution(self._moments(x)))

    def _moments(self, x):
        """encode_moments, with an OPT-IN per-image memo (env
        REF_SHIM_ENCODE_MEMO=1) for frozen-VAE runs: the reference's
        train_decoder re-encodes every image every epoch under no_grad
        (/root/reference/train_decoder.py:182-183) — a pure function of
        the pixels when the VAE is frozen, so caching by content hash is
        semantically transparent (bit-identical outputs) and makes the
        FLUX-architecture CPU head-to-head tractable.  Off by default;
        never engages when any parameter requires grad."""
        if not os.environ.get("REF_SHIM_ENCODE_MEMO") or self.training or \
                any(p.requires_grad for p in self.parameters()):
            return self.encode_moments(x)
        if not hasattr(self, "_encode_memo"):
            self._encode_memo = {}
        out = []
        for i in range(x.shape[0]):
            key = hash(x[i].numpy().tobytes())
            if key not in self._encode_memo:
                self._encode_memo[key] = self.encode_moments(x[i:i + 1])
            out.append(self._encode_memo[key])
        return torch.cat(out, dim=0)

    def decode(self, z):
        return SimpleNamespace(sample=AutoencoderKLOracle.decode(self, z))

    def save_pretrained(self, save_directory: str):
        """diffusers-layout export (config.json +
        diffusion_pytorch_model.safetensors).  train_full.py calls this on
        every best/periodic save (/root/reference/train_full.py:363,378);
        the oracle's state_dict already uses diffusers key names, so the
        tensors serialize directly."""
        import json

        from safetensors.torch import save_file

        os.makedirs(save_directory, exist_ok=True)
        cfg = dict(vars(self.config))
        cfg["_class_name"] = "AutoencoderKL"
        cfg["down_block_types"] = ["DownEncoderBlock2D"] * len(
            cfg["block_out_channels"])
        cfg["up_block_types"] = ["UpDecoderBlock2D"] * len(
            cfg["block_out_channels"])
        cfg["block_out_channels"] = list(cfg["block_out_channels"])
        with open(os.path.join(save_directory, "config.json"), "w") as f:
            json.dump(cfg, f, indent=2)
        sd = {k: v.contiguous() for k, v in self.state_dict().items()}
        save_file(sd, os.path.join(
            save_directory, "diffusion_pytorch_model.safetensors"))
