"""Decoder checkpoint I/O: torch ``pytorch_model.bin`` state dicts.

The reference saves tagger heads as raw torch state dicts
(``torch.save(decoder.state_dict(), ".../pytorch_model.bin")``,
``/root/reference/train_full.py:365``) and loads them with ``strict=False``
(``/root/reference/infer_full.py:62-63``).  We read/write the same format so
decoders trained with either framework interchange.

The flax tagger modules (models/taggers.py) are named after the torch
``state_dict`` keys, so the mapping reuses safetensors_io's mechanical rules;
only BatchNorm needs special-casing (running stats -> ``batch_stats``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .safetensors_io import (
    _flax_path_to_torch_key,
    flax_params_from_torch_state,
    load_torch_state,
    torch_state_from_flax_params,
)

# torch Sequential/BatchNorm leaves that are running stats, not params
_BN_STATS = ("running_mean", "running_var")


def load_decoder_params(path: str) -> Tuple[dict, dict]:
    """Load a decoder .bin/.pth/.safetensors -> (params, batch_stats) trees."""
    state = load_torch_state(path)
    params_state = {}
    stats_state: Dict[str, np.ndarray] = {}
    for k, v in state.items():
        leaf = k.rsplit(".", 1)[-1]
        if leaf in _BN_STATS:
            stats_state[k] = v
        else:
            params_state[k] = v
    params = flax_params_from_torch_state(params_state)

    batch_stats: dict = {}
    for k, v in stats_state.items():
        merged = k.replace(".running_mean", ".mean").replace(
            ".running_var", ".var")
        # reuse the index-merging path logic
        from .safetensors_io import _torch_key_to_flax_path

        path_parts, leaf = _torch_key_to_flax_path(merged)
        node = batch_stats
        for p in path_parts:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(v)
    return params, batch_stats


def save_decoder_bin(params: dict, batch_stats: dict | None, path: str) -> None:
    """Save flax decoder variables as a torch-compatible ``pytorch_model.bin``."""
    import torch

    state = torch_state_from_flax_params(params)
    if batch_stats:
        def walk(node, prefix: Tuple[str, ...]):
            for name, value in node.items():
                if isinstance(value, dict):
                    walk(value, prefix + (name,))
                else:
                    leaf = {"mean": "running_mean", "var": "running_var"}[name]
                    state[_flax_path_to_torch_key(prefix, leaf)] = np.asarray(value)

        walk(batch_stats, ())
    torch_state = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in state.items()}
    torch.save(torch_state, path)
