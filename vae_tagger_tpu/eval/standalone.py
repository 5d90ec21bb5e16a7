"""Standalone checkpoint evaluation (TPU extension).

The reference can only evaluate inside a training run — ``evaluate_model``
and ``find_optimal_threshold`` are invoked exclusively from the trainers'
final phase (``/root/reference/train_decoder.py:266-278``,
``train_full.py:384-399``); there is no way to score an already-trained
VAE + decoder pair against a labeled dataset without retraining.  This
module closes that gap: load the exported artifacts (diffusers-layout VAE
safetensors + decoder ``pytorch_model.bin``) through :class:`TaggerEngine`,
run one inference pass over a ``data.json``/``tags.csv`` dataset, and emit
the exact artifacts the trainers do (``optimal_thresholds.json``,
``evaluation_results.csv`` + ``_overall.json``).

``--use_val_split`` reproduces the trainers' 90/10 split (same shuffle
seed), so a checkpoint can be re-scored on exactly the validation subset
it was selected on.
"""

from __future__ import annotations

import numpy as np

from ..data.dataset import TaggedImageDataset
from ..data.loader import DataLoader, train_val_split
from ..infer.engine import TaggerEngine
from .threshold import collect_predictions, evaluate_model, \
    find_optimal_threshold


def evaluate_checkpoint(args, engine: TaggerEngine | None = None) -> dict:
    """Score a trained VAE+decoder on a labeled dataset; returns metrics."""
    if engine is None:
        engine = TaggerEngine.load(
            vae_checkpoint=args.vae_checkpoint,
            decoder_checkpoint=args.decoder_checkpoint,
            tags_csv_path=args.tags_csv_path,
            vae_config_path=args.vae_config_path,
            use_attention=args.use_attention,
            attention_config=getattr(args, "attention_config", None),
            mixed_precision=getattr(args, "mixed_precision", None),
            mesh=getattr(args, "mesh", None),
        )

    dataset = TaggedImageDataset(
        json_path=args.json_path,
        tags_csv_path=args.tags_csv_path,
        resolution=args.resolution,
        # square transform by default (like inference); pass --use_bucketing
        # with the training run's bucket grid to reproduce a bucketed
        # trainer's val metrics exactly (the loader batches per bucket,
        # one compiled shape each)
        use_bucketing=getattr(args, "use_bucketing", False),
        base_resolution=getattr(args, "base_resolution", 512),
        max_resolution=getattr(args, "max_resolution", 1024),
        bucket_step=getattr(args, "bucket_step", 64),
        return_triplets=False,
        seed=getattr(args, "seed", 42),
    )
    indices = None
    if getattr(args, "use_val_split", False):
        # trainers split with `args.seed or 42` (train/loop.py:38) — match
        # exactly, incl. seed 0 falling through to 42, or --use_val_split
        # silently scores a mix of train and val samples
        split_seed = getattr(args, "seed", 42) or 42
        _, indices = train_val_split(len(dataset), 0.1, seed=split_seed)
        print(f"evaluating the training val split: {len(indices)} of "
              f"{len(dataset)} samples (split seed {split_seed})")
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        num_workers=args.num_workers,
                        prefetch_factor=args.prefetch_factor,
                        seed=getattr(args, "seed", 42), indices=indices)

    def predict_fn(batch):
        # loader hands HWC uint8; the engine pads to device multiples and
        # normalizes on device.  Return the (lazily sliced) DEVICE array so
        # the pipelined collection pass overlaps this batch's materialization
        # with the next batch's transfer + compute
        probs, b = engine.classify_async(np.asarray(batch["pixel_values"]))
        return probs[:b]

    collected = collect_predictions(predict_fn, loader)
    threshold = getattr(args, "threshold", None)
    if threshold is None:
        results = find_optimal_threshold(
            predict_fn, loader, engine.tag_names,
            output_dir=args.output_dir, collected=collected)
        threshold = results["global_threshold"]
    metrics = evaluate_model(predict_fn, loader, engine.tag_names,
                             threshold=threshold,
                             output_dir=args.output_dir,
                             collected=collected)
    metrics["threshold"] = float(threshold)
    return metrics
