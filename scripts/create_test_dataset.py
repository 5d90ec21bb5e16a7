#!/usr/bin/env python
"""Synthetic fixture dataset CLI — format-compatible with the reference
``create_test_dataset.py`` (data.json weighted tags + tags.csv)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_dir", type=str, default="test_dataset")
    parser.add_argument("--num_images", type=int, default=100)
    parser.add_argument("--img_size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    from vae_tagger_tpu.utils import create_synthetic_dataset

    create_synthetic_dataset(args.output_dir, args.num_images,
                             img_size=args.img_size, seed=args.seed)


if __name__ == "__main__":
    main()
