#!/usr/bin/env python
"""Latent extraction CLI — flag-compatible with the reference ``infer_vae.py``."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

from vae_tagger_tpu.core.cli import add_vae_args  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Run VAE inference and save latent vectors.")
    add_vae_args(parser, require_checkpoint=True)
    parser.add_argument("--image_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="inference_output")
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="device batch size (TPU extension)")
    parser.add_argument("--num_workers", type=int, default=4,
                        help="decode threads overlapping the device "
                             "(TPU extension)")
    parser.add_argument("--prefetch_factor", type=int, default=2,
                        help="batches staged ahead of the device "
                             "(TPU extension)")
    parser.add_argument("--mixed_precision", type=str, default=None)
    parser.add_argument("--output_format", type=str, default="json",
                        choices=["json", "npz"],
                        help="json = reference-compatible latent_vectors"
                             ".json; npz = compressed fp32 arrays keyed by "
                             "image path (~40x smaller, TPU extension)")
    parser.add_argument("--transfer_format", type=str, default="rgb",
                        choices=["rgb", "yuv420"],
                        help="host->device pixel wire format (TPU "
                             "extension): yuv420 ships planar 4:2:0 at "
                             "1.5 B/px (half of RGB) and reconstitutes RGB "
                             "on device ahead of the encoder; ignored "
                             "with --tiled")
    parser.add_argument("--tiled", action="store_true",
                        help="encode each image at its NATIVE resolution "
                             "through fixed-shape overlapping tiles instead "
                             "of square-resizing to --resolution (TPU "
                             "extension; HBM bounded by one tile batch)")
    parser.add_argument("--tile_size", type=int, default=1024,
                        help="tile extent in pixels for --tiled "
                             "(multiple of 8)")
    parser.add_argument("--tile_overlap", type=int, default=256,
                        help="neighbor overlap in pixels for --tiled "
                             "(multiple of 8; seams blend across it)")
    args = parser.parse_args()

    from vae_tagger_tpu.infer import infer_and_save_latents
    from vae_tagger_tpu.infer.latents import (
        VAEOnlyEngine,
        infer_and_save_latents_tiled,
    )

    engine = VAEOnlyEngine(vae_checkpoint=args.vae_checkpoint,
                           vae_config_path=args.vae_config_path,
                           mixed_precision=args.mixed_precision)
    if args.tiled:
        if args.transfer_format != "rgb":
            print("tiled encode works on native-resolution RGB "
                  "(--transfer_format yuv420 ignored)")
        infer_and_save_latents_tiled(engine.vae, engine.vae_params,
                                     args.image_path,
                                     output_dir=args.output_dir,
                                     tile=args.tile_size,
                                     overlap=args.tile_overlap,
                                     output_format=args.output_format)
        return
    infer_and_save_latents(engine, args.image_path,
                           output_dir=args.output_dir,
                           resolution=args.resolution,
                           batch_size=args.batch_size,
                           num_workers=args.num_workers,
                           prefetch_factor=args.prefetch_factor,
                           output_format=args.output_format,
                           transfer_format=args.transfer_format)


if __name__ == "__main__":
    main()
