"""Checkpoint I/O: diffusers-layout safetensors <-> Flax NHWC params.

The reference loads FLUX VAE weights from ``.safetensors`` / ``.bin``
(``/root/reference/diffusers_vae_loader.py:37-51``) and exports with
``save_pretrained`` -> ``config.json`` + ``diffusion_pytorch_model.safetensors``
(``/root/reference/train_full.py:363``).  This module keeps both directions
byte-compatible so checkpoints interchange freely with the PyTorch ecosystem.

Key mapping is mechanical:
  torch module path          flax tree path
  encoder.down_blocks.0.resnets.1.conv1.weight
    -> encoder / down_blocks_0 / resnets_1 / conv1 / kernel  (OIHW -> HWIO)
  *.to_q.weight              -> */to_q/kernel                ((out,in) -> (in,out))
  *.norm*.weight             -> */norm*/scale                (1-D, unchanged)

Rank decides the layout transform: 4-D = conv, 2-D = linear, 1-D = norm/bias.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Tuple

import numpy as np

from ..core.config import VAEConfig, vae_config_from_dict

_INDEXED = re.compile(
    r"\.(\d+)(?=\.|$)"
)


def _torch_key_to_flax_path(key: str) -> Tuple[Tuple[str, ...], str]:
    """'encoder.down_blocks.0.resnets.1.norm1.weight' ->
    (('encoder','down_blocks_0','resnets_1','norm1'), 'weight')"""
    # merge numeric indices into the preceding name: a.0 -> a_0
    merged = _INDEXED.sub(lambda m: f"_{m.group(1)}", key)
    parts = merged.split(".")
    return tuple(parts[:-1]), parts[-1]


def _flax_path_to_torch_key(path: Tuple[str, ...], leaf: str) -> str:
    """Inverse of _torch_key_to_flax_path for the module-name conventions used
    in this package (indices are embedded as trailing _<int>)."""
    out = []
    for p in path:
        m = re.match(r"^(.*)_(\d+)$", p)
        if m and m.group(1) in (
            # VAE (diffusers layout)
            "down_blocks", "up_blocks", "resnets", "attentions",
            "downsamplers", "upsamplers", "to_out",
            # tagger heads (reference nn.Sequential indices)
            "classifier", "channel_att", "spatial_att", "feature_compress",
        ):
            out.append(m.group(1))
            out.append(m.group(2))
        else:
            out.append(p)
    return ".".join(out + [leaf])


def flax_params_from_torch_state(state: Dict[str, np.ndarray]) -> dict:
    """Convert a torch-layout state dict (numpy arrays) into a Flax param tree.

    Returns the nested dict to place under ``{"params": ...}``.
    ``num_batches_tracked`` entries are dropped (unused by inference/training
    here, matching flax BatchNorm).
    """
    tree: dict = {}
    for key, value in state.items():
        if key.endswith("num_batches_tracked"):
            continue
        path, leaf = _torch_key_to_flax_path(key)
        arr = np.asarray(value)
        if leaf == "weight":
            if arr.ndim == 4:        # conv OIHW -> HWIO
                arr = arr.transpose(2, 3, 1, 0)
                leaf = "kernel"
            elif arr.ndim == 2:      # linear (out,in) -> (in,out)
                arr = arr.transpose(1, 0)
                leaf = "kernel"
            else:                    # norm affine
                leaf = "scale"
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = arr
    return tree


def torch_state_from_flax_params(params: dict) -> Dict[str, np.ndarray]:
    """Inverse conversion: Flax param tree -> torch-layout flat state dict."""
    state: Dict[str, np.ndarray] = {}

    def walk(node: dict, path: Tuple[str, ...]):
        for name, value in node.items():
            if isinstance(value, dict):
                walk(value, path + (name,))
                continue
            arr = np.asarray(value)
            leaf = name
            if leaf == "kernel":
                if arr.ndim == 4:
                    arr = arr.transpose(3, 2, 0, 1)   # HWIO -> OIHW
                elif arr.ndim == 2:
                    arr = arr.transpose(1, 0)
                leaf = "weight"
            elif leaf == "scale":
                leaf = "weight"
            state[_flax_path_to_torch_key(path, leaf)] = arr

    walk(params, ())
    return state


def _load_safetensors_numpy(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    try:
        return load_file(path)
    except Exception:
        # bf16/fp16 tensors may not roundtrip through the numpy API on some
        # versions — fall back to torch (CPU build is available).
        import torch
        from safetensors.torch import load_file as load_torch

        return {k: v.float().numpy() for k, v in load_torch(path).items()}


def _load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in state.items()}


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-layout checkpoint (.safetensors or pickle .bin/.pth)."""
    if path.endswith(".safetensors"):
        return _load_safetensors_numpy(path)
    return _load_torch_bin(path)


def diff_trees(reference: dict, loaded: dict, *, verbose: bool = True,
               label: str = "") -> tuple:
    """(missing, unexpected) key-path sets with the reference's strict=False
    key-diff reporting (``/root/reference/diffusers_vae_loader.py:44-49``)."""
    import jax

    ref_flat = jax.tree_util.tree_flatten_with_path(reference)[0]
    ref_paths = {tuple(p.key for p in kp) for kp, _ in ref_flat}
    got_flat = jax.tree_util.tree_flatten_with_path(loaded)[0]
    got_paths = {tuple(p.key for p in kp) for kp, _ in got_flat}
    missing = sorted(ref_paths - got_paths)
    unexpected = sorted(got_paths - ref_paths)
    if verbose and missing:
        print(f"{label}missing keys: {['/'.join(m) for m in missing]}")
    if verbose and unexpected:
        print(f"{label}unexpected keys: {['/'.join(u) for u in unexpected]}")
    return missing, unexpected


def merge_into_reference(reference: dict, loaded: dict) -> dict:
    """Overlay loaded leaves onto the reference tree (missing keys keep the
    reference values; unexpected keys are dropped); shapes are validated
    against the reference."""

    def merge(ref_node, loaded_node):
        if not isinstance(ref_node, dict):
            return loaded_node if loaded_node is not None else ref_node
        out = {}
        for k, v in ref_node.items():
            lv = loaded_node.get(k) if isinstance(loaded_node, dict) else None
            out[k] = merge(v, lv)
        return out

    merged = merge(reference, loaded)

    def check_shapes(ref_node, new_node, path=()):
        if not isinstance(ref_node, dict):
            if np.shape(ref_node) != np.shape(new_node):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"{np.shape(new_node)} vs expected {np.shape(ref_node)}")
            return
        for k in ref_node:
            check_shapes(ref_node[k], new_node[k], path + (k,))

    check_shapes(reference, merged)
    return merged


def load_vae_params(path: str, reference_params: dict | None = None,
                    verbose: bool = True) -> dict:
    """Load VAE weights into a Flax param tree.

    Like the reference's ``strict=False`` load with key-diff reporting: when
    ``reference_params`` (a freshly initialized tree) is given, missing keys
    keep their initialization, unexpected keys are reported and dropped.
    """
    state = load_torch_state(path)
    loaded = flax_params_from_torch_state(state)
    if reference_params is None:
        return loaded
    missing, _ = diff_trees(reference_params, loaded, verbose=verbose,
                            label="VAE ")
    if verbose:
        warn_if_quant_convs_missing(missing)
    return merge_into_reference(reference_params, loaded)


def warn_if_quant_convs_missing(missing) -> None:
    """Loud hint for the likeliest silent-corruption case of a strict=False
    VAE load: a trimmed config JSON omitted the quant flags, so diffusers'
    defaults (use_quant_conv=True) built convs a FLUX-family checkpoint
    doesn't have — running with their random init corrupts every latent.
    Same outcome as the reference's strict=False load, but said loudly."""
    if any(m and m[0] in ("quant_conv", "post_quant_conv") for m in missing):
        print("WARNING: the checkpoint has no quant_conv weights but the "
              "config requests them (use_quant_conv / use_post_quant_conv "
              "default TRUE when a config JSON omits them, like diffusers). "
              "If this is a FLUX-family VAE, set both to false in the "
              "config — randomly-initialized quant convs corrupt latents.")


def save_vae_pretrained(params: dict, config: VAEConfig, output_dir: str) -> None:
    """Diffusers ``save_pretrained``-style export: ``config.json`` +
    ``diffusion_pytorch_model.safetensors`` (train_full.py:363)."""
    from safetensors.numpy import save_file

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.json"), "w", encoding="utf-8") as f:
        json.dump(config.to_json_dict(), f, indent=2)
    state = torch_state_from_flax_params(params)
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, os.path.join(output_dir, "diffusion_pytorch_model.safetensors"))


def load_vae_pretrained_dir(path: str):
    """Load a save_pretrained-style directory -> (VAEConfig, flax params)."""
    with open(os.path.join(path, "config.json"), "r", encoding="utf-8") as f:
        config = vae_config_from_dict(json.load(f))
    params = load_vae_params(
        os.path.join(path, "diffusion_pytorch_model.safetensors"))
    return config, params
