"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware (single chip) is reserved for bench.py; tests validate
numerics and multi-chip sharding on the CPU backend with 8 virtual devices.
The clean-environment re-exec lives in the repo-root conftest.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the build host has a single CPU core; cache
# XLA compiles across pytest runs.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_trainer_args(vae_dir, ds, output_dir, **overrides):
    """Reference-style trainer args for a tiny 32px run (every flag the
    three trainers read, defaults matching the e2e tests)."""
    import argparse

    args = argparse.Namespace(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        vae_config_path=f"{vae_dir}/config.json",
        decoder_checkpoint=None,
        json_path=ds["data_json"], tags_csv_path=ds["tags_csv"],
        output_dir=str(output_dir),
        resolution=32, train_batch_size=2, num_epochs=1,
        learning_rate=1e-3, weight_decay=1e-6,
        use_attention=True, no_attention=False,
        use_spatial_attention=True, use_self_attention=True,
        use_cross_attention=False, attention_heads=8, attention_dropout=0.1,
        use_focal_loss=True, use_class_balanced=False, focal_alpha=1.0,
        focal_gamma=2.0, lr_scheduler_type="cosine", lr_warmup_steps=2,
        max_grad_norm=1.0, logging_steps=100, save_steps=1000,
        mixed_precision="no", use_bucketing=False, base_resolution=32,
        max_resolution=64, bucket_step=32, num_workers=1, prefetch_factor=1,
        gradient_accumulation_steps=1, seed=0, resume_from=None,
        reconstruction_weight=0.01, kl_weight=1e-7, triplet_weight=1.0,
        bce_weight=1.0, triplet_margin=1.0, use_simplified_loss=True,
        use_adaptive_weights=False, similarity_type="cosine",
        use_simplified_vae_loss=True, remat=False,
    )
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


@pytest.fixture(scope="session")
def workspace_vae(tmp_path_factory):
    """A frozen random tiny VAE saved in diffusers layout (shared across
    tests that need a loadable VAE checkpoint without caring about its
    weights)."""
    import jax.numpy as jnp

    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.io import save_vae_pretrained
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    config = default_flux_vae_config(
        block_out_channels=(8, 16, 16, 16), norm_num_groups=4,
        latent_channels=16, sample_size=32)
    model = AutoencoderKL(config)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 32, 32, 3)),
                                 jax.random.key(1))["params"]
    vae_dir = str(tmp_path_factory.mktemp("shared_vae") / "vae")
    save_vae_pretrained(params, config, vae_dir)
    return vae_dir
