#!/usr/bin/env python
"""Dump the tagger head's attention maps for a set of images.

A TPU extension with no working reference counterpart: the reference's
``get_attention_maps`` is an empty stub (``/root/reference/modules.py:477-485``).
Writes per-image NPZ maps plus PNG heat overlays (CBAM spatial gate, MHSA
attention-received) — see vae_tagger_tpu/infer/attention_viz.py.
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
        description="Extract attention maps (NPZ + PNG overlays) from the "
                    "tagger head.")
    add_vae_args(parser, require_checkpoint=True)
    add_decoder_ckpt_arg(parser, required=True)
    parser.add_argument("--image_path", type=str, required=True,
                        help="an image file or a directory of images")
    parser.add_argument("--tags_csv_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="attention_output")
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--max_images", type=int, default=None)
    parser.add_argument("--no_overlays", action="store_true",
                        help="write only the raw NPZ maps")
    parser.add_argument("--mixed_precision", type=str, default=None)
    add_attention_args(parser)
    args = parser.parse_args()

    attention_config = resolve_attention_flags(args)
    if not args.use_attention:
        parser.error("the plain ClassificationDecoder has no attention "
                     "maps; this tool needs an attention head checkpoint")

    from vae_tagger_tpu.infer import TaggerEngine
    from vae_tagger_tpu.infer.attention_viz import dump_attention_maps

    engine = TaggerEngine.load(
        vae_checkpoint=args.vae_checkpoint,
        decoder_checkpoint=args.decoder_checkpoint,
        tags_csv_path=args.tags_csv_path,
        vae_config_path=args.vae_config_path,
        use_attention=True,
        attention_config=attention_config,
        mixed_precision=args.mixed_precision,
    )
    dump_attention_maps(engine, args.image_path, args.output_dir,
                        resolution=args.resolution,
                        batch_size=args.batch_size,
                        save_overlays=not args.no_overlays,
                        max_images=args.max_images)


if __name__ == "__main__":
    main()
