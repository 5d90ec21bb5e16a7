"""vae_tagger_tpu — a TPU-native JAX/Flax rebuild of the VAE-Tagger framework.

The reference project (spawner1145/vae-tagger) trains and serves an image
multi-label tagger: a FLUX AutoencoderKL encoder produces 16-channel latents
and an attention-based classification decoder maps latents to per-tag sigmoid
confidences.  This package re-designs every component TPU-first:

- NHWC Flax models compiled by XLA (MXU-friendly convs, bf16 policy)
- Pallas kernels for the hot ops (mid-block flash attention, fused GroupNorm+SiLU)
- SPMD data parallelism via ``jax.sharding`` over a device mesh
- an async host data pipeline with aspect-ratio bucketing mapped to a fixed
  set of compiled shapes
- safetensors checkpoints byte-compatible with the diffusers FLUX VAE layout

Layer map (mirrors SURVEY.md §1):
  core/      config dataclasses, precision policy, rng
  parallel/  mesh + sharding helpers (ICI collectives via XLA)
  ops/       functional numerics (norms, attention, pooling) + pallas kernels
  nn/        Flax building blocks (resnet/down/up/mid blocks)
  models/    AutoencoderKL + tagger heads + factories
  io/        safetensors/torch-bin/orbax checkpoint I/O
  data/      dataset, bucketing, triplet mining, async loader
  losses/    focal / class-balanced / triplet / contrastive / combined
  train/     jit-compiled update steps + training loops
  eval/      multi-label metrics + threshold search
  infer/     batched tagging + latent extraction
"""

__version__ = "0.1.0"
