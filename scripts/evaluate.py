#!/usr/bin/env python
"""Standalone checkpoint evaluation CLI (TPU extension).

The reference has no way to score an already-trained VAE + decoder pair —
``evaluate_model``/``find_optimal_threshold`` only run inside the trainers'
final phase (``/root/reference/train_decoder.py:266-278``).  This script
evaluates exported artifacts against any labeled dataset:

    python scripts/evaluate.py \
        --vae_checkpoint out/best_vae/diffusion_pytorch_model.safetensors \
        --vae_config_path out/best_vae/config.json \
        --decoder_checkpoint out/best_decoder/pytorch_model.bin \
        --json_path ds/data.json --tags_csv_path ds/tags.csv \
        --output_dir eval_out

Writes the trainers' exact evaluation artifacts (optimal_thresholds.json,
evaluation_results.csv + _overall.json).
"""

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
    add_decoder_ckpt_arg,
    add_vae_args,
    resolve_attention_flags,
)


def main():
    parser = argparse.ArgumentParser(
        description="Evaluate a trained VAE+decoder on a labeled dataset.")
    add_vae_args(parser, require_checkpoint=True)
    add_decoder_ckpt_arg(parser, required=True)
    parser.add_argument("--json_path", type=str, required=True)
    parser.add_argument("--tags_csv_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="evaluation_output")
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--prefetch_factor", type=int, default=2)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--threshold", type=float, default=None,
                        help="evaluate at a fixed threshold instead of "
                             "searching for the optimal one")
    parser.add_argument("--use_val_split", action="store_true",
                        help="score only the trainers' 90/10 val subset "
                             "(same split seed)")
    parser.add_argument("--mixed_precision", type=str, default=None)
    parser.add_argument("--no_data_parallel", action="store_true",
                        help="disable automatic SPMD sharding across all "
                             "local devices")
    add_bucketing_args(parser)  # match a bucketed training run's transform
    add_attention_args(parser)
    args = parser.parse_args()
    args.attention_config = resolve_attention_flags(args)

    from vae_tagger_tpu.eval.standalone import evaluate_checkpoint
    from vae_tagger_tpu.parallel.mesh import auto_data_parallel

    args.mesh, args.batch_size = auto_data_parallel(
        args.batch_size, not args.no_data_parallel, what="evaluation")

    os.makedirs(args.output_dir, exist_ok=True)
    metrics = evaluate_checkpoint(args)
    print(f"macro F1 {metrics['f1_macro']:.4f} @ threshold "
          f"{metrics['threshold']:.2f}; artifacts in {args.output_dir}")


if __name__ == "__main__":
    main()
