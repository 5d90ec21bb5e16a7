#!/usr/bin/env python
"""Dataset linter CLI — flag-compatible with the reference ``validate_data.py``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Validate dataset JSON/CSV consistency and completeness.")
    parser.add_argument("--json_path", type=str, required=True)
    parser.add_argument("--tags_csv_path", type=str, required=True,
                        help="tags CSV (must contain a 'name' column)")
    parser.add_argument("--output_dir", type=str, default="data_validation")
    parser.add_argument("--fix", action="store_true",
                        help="emit cleaned data.cleaned.json (drops missing "
                        "images and unknown tags)")
    args = parser.parse_args()

    from vae_tagger_tpu.utils.validation import validate_dataset

    validate_dataset(args.json_path, args.tags_csv_path, args.output_dir,
                     args.fix)


if __name__ == "__main__":
    main()
