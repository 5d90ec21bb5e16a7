#!/usr/bin/env python
"""Frozen-VAE classifier training CLI — flag-compatible with the reference
``train_decoder.py``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

from vae_tagger_tpu.core.cli import (  # noqa: E402
    add_attention_args,
    add_bucketing_args,
    add_data_args,
    add_decoder_ckpt_arg,
    add_train_args,
    add_vae_args,
)


def main():
    parser = argparse.ArgumentParser()
    add_vae_args(parser, require_checkpoint=True)
    add_decoder_ckpt_arg(parser)
    add_data_args(parser)
    parser.add_argument("--output_dir", type=str, default="decoder_output")
    add_train_args(parser, default_lr=1e-3)
    add_attention_args(parser)
    add_bucketing_args(parser)
    # loss flags (decoder subset)
    parser.add_argument("--use_simplified_decoder_loss", action="store_true",
                        default=True, help="(compat; parsed but unused, as in "
                        "the reference)")
    parser.add_argument("--use_focal_loss", action="store_true")
    parser.add_argument("--use_class_balanced", action="store_true")
    parser.add_argument("--focal_alpha", type=float, default=1.0)
    parser.add_argument("--focal_gamma", type=float, default=2.0)
    parser.add_argument("--resume_from", type=str, default=None,
                        help="orbax train-state checkpoint to resume from "
                        "(TPU extension; the reference parses no resume flag)")
    parser.add_argument("--cache_latents", action="store_true",
                        help="cache frozen-VAE latents per sample after the "
                        "first epoch (TPU extension): the encode is ~90%% of "
                        "a decoder-train step and latents are deterministic "
                        "with the default center crop; epochs >= 2 skip it. "
                        "Costs host RAM (~latent bytes per sample, e.g. "
                        "256KB/image at 512px fp32); epoch 1 pays a small "
                        "per-step sync")
    parser.add_argument("--cache_latents_max_gb", type=float, default=8.0,
                        help="host-RAM cap for --cache_latents; beyond it "
                        "later samples simply stay on the encode path")
    args = parser.parse_args()

    from vae_tagger_tpu.train.train_decoder import train_decoder

    train_decoder(args)


if __name__ == "__main__":
    main()
