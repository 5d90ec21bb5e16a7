"""Kernel backend selection: pure-XLA ops vs hand-written Pallas kernels.

Every hot op in this package has an XLA reference implementation and may have
a Pallas TPU kernel.  The backend is process-global and defaults to "auto":
Pallas on real TPU devices, XLA elsewhere (CPU tests, interpret mode).

This replaces the reference's xformers opt-in flag
(``/root/reference/train_full.py:55-57``) with a framework-wide switch.
"""

from __future__ import annotations

import contextlib
import os

import jax

_BACKEND = os.environ.get("VAE_TAGGER_KERNEL_BACKEND", "auto")
_VALID = ("auto", "xla", "pallas")


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in _VALID:
        raise ValueError(f"backend must be one of {_VALID}, got {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


# Per-op "auto" policy, set from in-context measurements on the v5e
# (benchmarks/ablate.py, benchmarks/stage0_probe.py, docs/PERF.md): flash
# attention and the whole-sample GN+SiLU kernel win or tie; the fused
# GN+SiLU+conv kernel and the grid-chunked GN kernel measured *slower* than
# XLA's in-context conv/two-pass-GN at every stage shape, so "auto" leaves
# them off — backend "pallas" forces every kernel on.
_AUTO_POLICY = {
    "flash_attention": True,
    "groupnorm_silu": True,
    "groupnorm_silu_chunked": False,
    "conv_fused": False,
}
# NOT in the policy and never dispatched: ops/winograd.py.  It is a complete,
# parity-tested F(2x2,3x3) implementation kept strictly as negative-result
# evidence — measured in-context it LOST to XLA's direct conv emitter at
# every VAE stage shape (docs/PERF.md "Winograd"), so no production path
# imports it.  Do not wire it here without a new on-chip measurement.


def use_pallas(op: str | None = None) -> bool:
    """True when the Pallas kernel for ``op`` should be dispatched.

    ``op=None`` asks whether Pallas is available at all (TPU + not forced
    off); named ops additionally consult the measured auto policy above.
    """
    if _BACKEND == "xla":
        return False
    on_tpu = False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        pass
    if _BACKEND == "pallas":
        return True
    return on_tpu and (op is None or _AUTO_POLICY.get(op, False))


@contextlib.contextmanager
def backend(name: str):
    """Temporarily force a backend (used by numerics parity tests)."""
    global _BACKEND
    prev = _BACKEND
    set_backend(name)
    try:
        yield
    finally:
        _BACKEND = prev
