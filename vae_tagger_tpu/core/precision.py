"""Mixed-precision policy for TPU.

The reference uses CUDA fp16 autocast + GradScaler via HF Accelerate
(``/root/reference/train_full.py:39,454``).  On TPU the native fast dtype is
bfloat16: same exponent range as fp32, so no loss scaling is needed.  We keep
parameters in fp32 and run matmuls/convs in bf16 when mixed precision is on.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy threaded through every model.

    param_dtype:   dtype parameters are stored in (fp32 for stable training)
    compute_dtype: dtype activations/matmuls run in (bf16 on TPU for speed)
    output_dtype:  dtype of user-facing outputs (latents, logits)
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_output(self, x):
        return jnp.asarray(x, self.output_dtype)


FP32 = Policy()
BF16 = Policy(compute_dtype=jnp.bfloat16)


def resolve_mixed_precision(name: str | None) -> Policy:
    """Map the reference's ``--mixed_precision`` flag values to TPU policies.

    The reference accepts {"no", "fp16", "bf16"} (HF Accelerate strings,
    ``/root/reference/train_full.py:454``).  fp16 has no TPU fast path, so both
    "fp16" and "bf16" select bf16 compute; "no"/None selects full fp32.
    """
    if name is None or name in ("no", "fp32", "float32"):
        return FP32
    if name in ("fp16", "float16", "bf16", "bfloat16"):
        return BF16
    raise ValueError(f"unknown mixed_precision: {name!r}")
