#!/usr/bin/env python
"""Resolution analyzer CLI — flag-compatible with the reference
``analyze_resolutions.py``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser(
        description="Analyze image resolution distribution of a dataset.")
    parser.add_argument("--json_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="resolution_analysis")
    args = parser.parse_args()

    from vae_tagger_tpu.utils.validation import analyze_image_resolutions

    try:
        analyze_image_resolutions(args.json_path, args.output_dir)
        print("\nanalysis complete!")
    except Exception as e:
        print(f"analysis failed: {e}")


if __name__ == "__main__":
    main()
