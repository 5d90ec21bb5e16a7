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


def use_pallas() -> bool:
    """True when Pallas kernels should be dispatched."""
    if _BACKEND == "pallas":
        return True
    if _BACKEND == "xla":
        return False
    # auto: pallas only on real TPU backends
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


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
