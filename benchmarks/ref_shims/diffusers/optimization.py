"""diffusers.optimization.get_scheduler shim (cosine/linear/constant with
warmup, the standard formulas the reference presets use —
train_decoder.py:8, lr_scheduler_type default 'cosine')."""

from __future__ import annotations

import math

from torch.optim.lr_scheduler import LambdaLR


def get_scheduler(name, optimizer, num_warmup_steps=0,
                  num_training_steps=None, **_):
    name = str(name)

    def warmup(step):
        if num_warmup_steps and step < num_warmup_steps:
            return step / max(1, num_warmup_steps)
        return None

    if name in ("constant", "constant_with_warmup"):
        def fn(step):
            w = warmup(step)
            return w if w is not None else 1.0
    elif name == "linear":
        def fn(step):
            w = warmup(step)
            if w is not None:
                return w
            total = max(1, num_training_steps - num_warmup_steps)
            return max(0.0, (num_training_steps - step) / total)
    elif name == "cosine":
        def fn(step):
            w = warmup(step)
            if w is not None:
                return w
            total = max(1, num_training_steps - num_warmup_steps)
            progress = min(1.0, (step - num_warmup_steps) / total)
            return 0.5 * (1.0 + math.cos(math.pi * progress))
    else:
        raise ValueError(f"shim does not implement scheduler {name!r}")
    return LambdaLR(optimizer, fn)
