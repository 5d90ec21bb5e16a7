"""core/runtime.py: persistent compile-cache wiring for the CLI scripts."""

import os

import jax

from vae_tagger_tpu.core.runtime import enable_persistent_compile_cache


def test_cache_dir_configured(tmp_path, monkeypatch):
    target = str(tmp_path / "xla_cache")
    monkeypatch.setenv("VAE_TAGGER_COMPILE_CACHE", target)
    monkeypatch.delenv("VAE_TAGGER_NO_COMPILE_CACHE", raising=False)
    prev = jax.config.jax_compilation_cache_dir
    try:
        out = enable_persistent_compile_cache()
        assert out == target
        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_cache_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("VAE_TAGGER_NO_COMPILE_CACHE", "1")
    monkeypatch.setenv("VAE_TAGGER_COMPILE_CACHE", str(tmp_path / "nope"))
    prev = jax.config.jax_compilation_cache_dir
    assert enable_persistent_compile_cache() is None
    assert jax.config.jax_compilation_cache_dir == prev
    assert not (tmp_path / "nope").exists()
