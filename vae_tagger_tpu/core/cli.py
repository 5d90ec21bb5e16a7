"""Shared argparse flag groups, CLI-compatible with the reference entry
points (train_full.py:402-474, infer_full.py:144-174, etc.).

The reference duplicates ~50 flags per script; here each logical group is
declared once.  Known reference quirks preserved deliberately:
- ``--use_attention``/``--use_spatial_attention``/``--use_self_attention``
  are store_true with default True (disable via ``--no_attention``);
- ``--mixed_precision`` accepts the HF strings ("no"/"fp16"/"bf16"); both
  fp16 and bf16 map to bf16 on TPU (core/precision.py).
"""

from __future__ import annotations

import argparse


def add_vae_args(p: argparse.ArgumentParser, require_checkpoint: bool = False):
    p.add_argument("--vae_checkpoint", type=str,
                   required=require_checkpoint, default=None,
                   help="pretrained VAE weights (.safetensors/.bin)")
    p.add_argument("--vae_config_path", type=str, default=None,
                   help="VAE config file (diffusers-style JSON)")


def add_decoder_ckpt_arg(p: argparse.ArgumentParser, required: bool = False):
    p.add_argument("--decoder_checkpoint", type=str, required=required,
                   default=None, help="decoder weights (.bin/.pth)")


def add_attention_args(p: argparse.ArgumentParser):
    p.add_argument("--use_attention", action="store_true", default=True,
                   help="use the attention decoder (default on)")
    p.add_argument("--no_attention", action="store_true",
                   help="disable the attention decoder")
    p.add_argument("--use_spatial_attention", action="store_true", default=True)
    p.add_argument("--use_self_attention", action="store_true", default=True)
    p.add_argument("--use_cross_attention", action="store_true")
    p.add_argument("--attention_heads", type=int, default=8)
    p.add_argument("--attention_dropout", type=float, default=0.1)


def add_bucketing_args(p: argparse.ArgumentParser):
    p.add_argument("--use_bucketing", action="store_true",
                   help="enable aspect-ratio bucketing")
    p.add_argument("--base_resolution", type=int, default=512)
    p.add_argument("--max_resolution", type=int, default=1024)
    p.add_argument("--bucket_step", type=int, default=64)


def add_data_args(p: argparse.ArgumentParser):
    p.add_argument("--json_path", type=str, required=True)
    p.add_argument("--tags_csv_path", type=str, required=True)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--prefetch_factor", type=int, default=2)


def add_train_args(p: argparse.ArgumentParser, default_lr: float = 1e-4):
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--learning_rate", type=float, default=default_lr)
    p.add_argument("--weight_decay", type=float, default=1e-6)
    p.add_argument("--lr_scheduler_type", type=str, default="cosine")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--save_steps", type=int, default=5,
                   help="checkpoint interval in epochs")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mixed_precision", type=str, default="fp16",
                   help="no|fp16|bf16 (both fp16 and bf16 run bf16 on TPU)")
    # accepted for reference CLI compatibility; TPU equivalents are automatic
    p.add_argument("--enable_xformers_memory_efficient_attention",
                   action="store_true",
                   help="(compat) TPU flash attention is on by default")
    p.add_argument("--cudnn_benchmark", action="store_true",
                   help="(compat) XLA autotunes automatically")
    p.add_argument("--cudnn_deterministic", action="store_true",
                   help="(compat) jit compilation is deterministic")
    p.add_argument("--use_safetensors", action="store_true",
                   help="(compat) safetensors is always used for the VAE")
    p.add_argument("--use_quant_conv", action="store_true")
    p.add_argument("--use_post_quant_conv", action="store_true")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace of N steady-state "
                   "steps to <output_dir>/profile (TPU extension)")
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing on the VAE blocks (TPU "
                   "extension): O(stage) activation memory for ~30%% extra "
                   "forward FLOPs — enables 1024px training at larger batch")
    p.add_argument("--sync_checkpoints", action="store_true",
                   help="write checkpoints synchronously (TPU extension: "
                   "single-process runs overlap the orbax/safetensors/bin "
                   "writes with the next epoch by default)")
    p.add_argument("--spatial_parallel", action="store_true",
                   help="shard each image's HEIGHT over all local devices "
                   "instead of the batch (TPU extension): scales small-"
                   "batch high-resolution configs (e.g. 1024px bs1) that "
                   "cannot data-parallelize; resolutions must be divisible "
                   "by 8 x device_count")
    p.add_argument("--transfer_format", type=str, default="rgb",
                   choices=("rgb", "yuv420"),
                   help="wire format for images to the device (TPU "
                   "extension): yuv420 ships planar 4:2:0 (1.5 B/px, half "
                   "of RGB) and reconstitutes RGB on device — wins when "
                   "host->device bandwidth binds; numerics differ from rgb "
                   "only by the chroma subsample")
    p.add_argument("--val_draws", type=int, default=1,
                   help="average this many paired Monte Carlo draws per "
                   "validation batch (TPU extension): the val loss on "
                   "sampled-z objectives (train_vae and train_full — both "
                   "the simplified and full combined losses score a "
                   "sampled z for the triplet term) is a 1-draw estimate "
                   "whose noise decides best-checkpoint selection on small "
                   "val sets; K draws cut that noise sqrt(K)x for Kx val "
                   "compute.  Draws are paired across epochs (same rngs), "
                   "so the default of 1 keeps selection deterministic, "
                   "just noisier.  train_decoder's val loss is rng-free, "
                   "so its loop clamps K to 1 (no redundant eval passes)")


def add_loss_args(p: argparse.ArgumentParser):
    p.add_argument("--reconstruction_weight", type=float, default=0.01)
    p.add_argument("--kl_weight", type=float, default=1e-7)
    p.add_argument("--triplet_weight", type=float, default=1.0)
    p.add_argument("--bce_weight", type=float, default=1.0)
    p.add_argument("--triplet_margin", type=float, default=1.0)
    p.add_argument("--use_simplified_loss", action="store_true", default=True)
    p.add_argument("--no_simplified_loss", action="store_true",
                   help="use the full CombinedLoss (recon+KL+triplet+cls). "
                   "TPU extension: in the reference --use_simplified_loss "
                   "defaults True and cannot be disabled, making the full "
                   "loss branch unreachable (train_full.py:438)")
    p.add_argument("--use_focal_loss", action="store_true")
    p.add_argument("--use_class_balanced", action="store_true")
    p.add_argument("--use_adaptive_weights", action="store_true")
    p.add_argument("--focal_alpha", type=float, default=1.0)
    p.add_argument("--focal_gamma", type=float, default=2.0)
    p.add_argument("--similarity_type", type=str, default="cosine",
                   choices=["cosine", "euclidean"])


def resolve_attention_flags(args) -> dict | None:
    """Apply the --no_attention override and build the attention config dict
    (train_full.py:478-480, 65-71)."""
    if getattr(args, "no_attention", False):
        args.use_attention = False
    if not args.use_attention:
        return None
    return {
        "use_spatial_attention": args.use_spatial_attention,
        "use_self_attention": args.use_self_attention,
        "use_cross_attention": args.use_cross_attention,
        "attention_heads": args.attention_heads,
        "attention_dropout": args.attention_dropout,
    }
