#!/usr/bin/env python
"""Image tagging CLI — flag-compatible with the reference ``infer_full.py``.

Differences on TPU: images run in device-sized batches (not one by one), and
precision is bf16 on TPU / fp32 on CPU instead of CUDA fp16 autocast.
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
    add_decoder_ckpt_arg,
    add_vae_args,
    resolve_attention_flags,
)


def main():
    parser = argparse.ArgumentParser(
        description="Classify images with the VAE + tagger decoder.")
    add_vae_args(parser, require_checkpoint=True)
    add_decoder_ckpt_arg(parser, required=True)
    parser.add_argument("--image_path", type=str, required=True,
                        help="an image file or a directory of images")
    parser.add_argument("--tags_csv_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="inference_output")
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--confidence_threshold", type=float, default=0.5)
    parser.add_argument("--batch_size", type=int, default=8,
                        help="device batch size (TPU extension)")
    parser.add_argument("--num_workers", type=int, default=4,
                        help="decode threads overlapping the device "
                             "(TPU extension)")
    parser.add_argument("--prefetch_factor", type=int, default=2,
                        help="batches staged ahead of the device "
                             "(TPU extension)")
    parser.add_argument("--no_data_parallel", action="store_true",
                        help="disable automatic SPMD sharding of inference "
                             "batches across all local devices")
    parser.add_argument("--spatial_parallel", action="store_true",
                        help="latency mode: shard each image's HEIGHT over "
                             "all local devices instead of the batch, so a "
                             "single image runs ~N-times faster on N chips "
                             "(TPU extension; resolution must be divisible "
                             "by 8 x device_count)")
    parser.add_argument("--transfer_format", type=str, default="rgb",
                        choices=["rgb", "yuv420"],
                        help="host->device pixel wire format (TPU "
                             "extension): yuv420 ships planar 4:2:0 at "
                             "1.5 B/px (half of RGB) and reconstitutes RGB "
                             "on device; tags match RGB within "
                             "chroma-resample noise")
    parser.add_argument("--mixed_precision", type=str, default=None)
    add_attention_args(parser)
    parser.add_argument("--model_checkpoint", type=str, default=None,
                        help="(deprecated) parent path for both checkpoints")
    args = parser.parse_args()

    attention_config = resolve_attention_flags(args)
    if args.model_checkpoint and (not args.vae_checkpoint
                                  or not args.decoder_checkpoint):
        print("back-compat mode: deriving checkpoint paths from "
              "--model_checkpoint")
        args.vae_checkpoint = args.vae_checkpoint or args.model_checkpoint
        args.decoder_checkpoint = (args.decoder_checkpoint
                                   or args.model_checkpoint)

    from vae_tagger_tpu.infer import TaggerEngine, infer_and_classify
    from vae_tagger_tpu.parallel.mesh import auto_data_parallel, make_mesh

    # data-parallel inference by default on multi-device hosts: params
    # replicate, batches shard P('data') (reference parity: accelerate
    # launch multi-GPU inference).  --spatial_parallel instead shards the
    # image height ('model' axis) — all chips cooperate on each image.
    import jax

    spatial = args.spatial_parallel and jax.device_count() > 1
    if spatial:
        mesh, batch_size = None, args.batch_size
    else:
        mesh, batch_size = auto_data_parallel(args.batch_size,
                                              not args.no_data_parallel)

    engine = TaggerEngine.load(
        vae_checkpoint=args.vae_checkpoint,
        decoder_checkpoint=args.decoder_checkpoint,
        tags_csv_path=args.tags_csv_path,
        vae_config_path=args.vae_config_path,
        use_attention=args.use_attention,
        attention_config=attention_config,
        mixed_precision=args.mixed_precision,
        mesh=mesh,
    )
    if spatial:
        engine = engine.with_spatial_mesh(make_mesh(("model",)))
        print(f"spatial-parallel inference over {jax.device_count()} "
              f"devices (image height sharded; latency mode)")
        if args.transfer_format != "rgb":
            print("spatial parallelism uses RGB transfer "
                  "(--transfer_format yuv420 ignored)")
            args.transfer_format = "rgb"
    infer_and_classify(
        engine, args.image_path, output_dir=args.output_dir,
        resolution=args.resolution,
        confidence_threshold=args.confidence_threshold,
        batch_size=batch_size,
        num_workers=args.num_workers,
        prefetch_factor=args.prefetch_factor,
        transfer_format=args.transfer_format)


if __name__ == "__main__":
    main()
