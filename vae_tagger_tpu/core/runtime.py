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
