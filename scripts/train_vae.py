#!/usr/bin/env python
"""VAE-only triplet training CLI — flag-compatible with the reference
``train_vae.py`` (note: --kl_weight default here is 1e-2, matching
train_vae.py:319; train_full uses 1e-7)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

from vae_tagger_tpu.core.cli import (  # noqa: E402
    add_bucketing_args,
    add_data_args,
    add_train_args,
    add_vae_args,
)


def main():
    parser = argparse.ArgumentParser()
    add_vae_args(parser)
    add_data_args(parser)
    parser.add_argument("--output_dir", type=str, default="vae_output")
    add_train_args(parser, default_lr=1e-4)
    add_bucketing_args(parser)
    parser.add_argument("--use_simplified_vae_loss", action="store_true",
                        default=True,
                        help="simplified VAE loss (recon + triplet; KL "
                        "monitored only)")
    parser.add_argument("--reconstruction_weight", type=float, default=0.01)
    parser.add_argument("--kl_weight", type=float, default=1e-2)
    parser.add_argument("--triplet_weight", type=float, default=1.0)
    parser.add_argument("--triplet_margin", type=float, default=1.0)
    parser.add_argument("--similarity_type", type=str, default="cosine",
                        choices=["cosine", "euclidean"])
    parser.add_argument("--resume_from", type=str, default=None,
                        help="orbax train-state checkpoint (TPU extension)")
    args = parser.parse_args()

    from vae_tagger_tpu.train.train_vae import train_vae

    train_vae(args)


if __name__ == "__main__":
    main()
