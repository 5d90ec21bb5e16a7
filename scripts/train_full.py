#!/usr/bin/env python
"""End-to-end VAE + tagger training CLI — flag-compatible with the reference
``train_full.py`` (incl. the --kl_weight 1e-7 default and the
--use_attention/--no_attention quirk)."""

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
    add_loss_args,
    add_train_args,
    add_vae_args,
)


def main():
    parser = argparse.ArgumentParser()
    add_data_args(parser)
    parser.add_argument("--output_dir", type=str, default="full_output")
    add_vae_args(parser)
    add_decoder_ckpt_arg(parser)
    add_train_args(parser, default_lr=1e-4)
    add_attention_args(parser)
    add_loss_args(parser)
    add_bucketing_args(parser)
    parser.add_argument("--resume_from", type=str, default=None,
                        help="orbax train-state checkpoint (TPU extension)")
    args = parser.parse_args()
    if args.no_simplified_loss:
        args.use_simplified_loss = False

    from vae_tagger_tpu.train.train_full import train_full

    train_full(args)


if __name__ == "__main__":
    main()
