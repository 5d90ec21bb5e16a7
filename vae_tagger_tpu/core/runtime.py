"""Process-level runtime setup shared by the CLI entry points.

The reference leans on cuDNN's in-process autotune cache
(``/root/reference/train_full.py:34-38``); XLA's equivalent lever is the
persistent compilation cache, which amortizes compiles ACROSS processes —
on TPU hosts where a 1024px train step takes tens of seconds to compile
(minutes through a remote-compile relay), the second invocation of any
CLI starts hot.  Tests configure their own cache dir (tests/conftest.py);
this hook is for the user-facing scripts.
"""

from __future__ import annotations

import os


def enable_persistent_compile_cache() -> str | None:
    """Point XLA's persistent compilation cache at a user-level dir.

    Called once at the top of every CLI script.  The dir can be moved with
    ``VAE_TAGGER_COMPILE_CACHE=<dir>`` or disabled entirely with
    ``VAE_TAGGER_NO_COMPILE_CACHE=1`` (e.g. when the cache lands on a slow
    network filesystem).  Returns the cache dir, or None when disabled or
    when this JAX build/backend cannot serialize executables (the hook
    then degrades to a no-op rather than failing the CLI).
    """
    if os.environ.get("VAE_TAGGER_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get(
        "VAE_TAGGER_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "vae_tagger_tpu",
                     "xla_cache"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold skips sub-second compiles; every program this
        # framework jits at real resolutions is far above it
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never block a CLI on cache plumbing
        print(f"persistent compile cache unavailable ({e}); continuing")
        return None
    return cache_dir


# What a 16 GB v5e reports as per-device bytes_limit.  Every measured memory
# policy in this package (train/steps.py stacking budget) was calibrated on
# that part; other parts scale linearly from it.  The real chip on this
# build host reports this via jax.local_devices()[0].memory_stats().
V5E_HBM_BYTES = 17_179_869_184  # 16 GiB


def device_hbm_bytes() -> int | None:
    """Per-device accelerator memory in bytes, or None when unknown.

    Priority: ``VAE_TAGGER_HBM_BYTES`` env override > the device's
    ``memory_stats()['bytes_limit']`` (TPU backends report it) > None (CPU
    test backend, or a plugin that doesn't implement memory_stats).
    Callers treat None as "assume the measured v5e baseline".
    """
    env = os.environ.get("VAE_TAGGER_HBM_BYTES")
    if env:
        try:
            return int(env)
        except ValueError:
            print(f"warning: ignoring non-integer VAE_TAGGER_HBM_BYTES={env!r}")
    try:
        import jax

        dev = jax.local_devices()[0]
        if jax.default_backend() != "tpu":
            return None  # CPU 'memory' is host RAM — not an HBM budget
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get(
            "bytes_reservable_limit")
        return int(limit) if limit else None
    except Exception:
        return None
