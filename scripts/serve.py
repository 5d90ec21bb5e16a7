#!/usr/bin/env python
"""Serve the tagger over HTTP with dynamic micro-batching.

Loads the same artifacts as infer_full.py (VAE safetensors + config JSON,
decoder pytorch_model.bin, tags CSV) and serves POST /classify at
device-batch throughput.  See vae_tagger_tpu/serve/server.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()


def main():
    p = argparse.ArgumentParser(description="vae-tagger HTTP server")
    p.add_argument("--vae_checkpoint", type=str, required=True)
    p.add_argument("--decoder_checkpoint", type=str, required=True)
    p.add_argument("--tags_csv_path", type=str, required=True)
    p.add_argument("--vae_config_path", type=str, default=None)
    p.add_argument("--resolution", type=int, nargs="+", default=[1024],
                   help="served resolution(s); the first is the default, "
                        "others are selectable via POST /classify?resolution=N")
    p.add_argument("--confidence_threshold", type=float, default=0.5)
    p.add_argument("--host", type=str, default="127.0.0.1",
                   help="bind address (no auth — 0.0.0.0 is an explicit "
                        "opt-in)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=None,
                   help="micro-batch size; default 8 * device_count")
    p.add_argument("--batch_timeout_ms", type=float, default=10.0)
    p.add_argument("--request_timeout_s", type=float, default=600.0)
    p.add_argument("--max_body_mb", type=float, default=32.0,
                   help="requests larger than this get 413 before the body "
                        "is read")
    p.add_argument("--max_queue", type=int, default=64,
                   help="pending-request cap; beyond it requests get 503")
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--no_data_parallel", action="store_true",
                   help="disable automatic SPMD sharding across all local "
                        "devices")
    p.add_argument("--spatial_parallel", action="store_true",
                   help="latency mode: shard each image's HEIGHT over all "
                        "local devices instead of the batch — lone requests "
                        "run ~N-times faster on N chips at some peak-"
                        "throughput cost; resolutions must be divisible by "
                        "8 x device_count")
    p.add_argument("--no_attention", action="store_true")
    p.add_argument("--transfer_format", type=str, default="rgb",
                   choices=["rgb", "yuv420"],
                   help="host->device pixel wire format: yuv420 ships "
                        "planar 4:2:0 (half the bytes of RGB; color "
                        "conversion fused on device) — frees host CPU and "
                        "transfer bandwidth at a small chroma-resolution "
                        "cost")
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=[None, "no", "fp16", "bf16"])
    args = p.parse_args()

    import jax

    from vae_tagger_tpu.infer.engine import TaggerEngine
    from vae_tagger_tpu.parallel.mesh import auto_data_parallel, make_mesh
    from vae_tagger_tpu.serve import TaggerServer

    # multi-device hosts serve SPMD: one program spanning all chips, batch
    # sharded P('data'); max_batch below scales to keep every chip fed.
    # --spatial_parallel instead shards each image's HEIGHT (latency mode:
    # a lone request uses every chip; micro-batching still coalesces).
    spatial = args.spatial_parallel and jax.device_count() > 1
    if spatial:
        mesh, default_max_batch = None, 8
    else:
        mesh, default_max_batch = auto_data_parallel(
            8, not args.no_data_parallel, what="serving",
            batch_label="default max_batch")

    engine = TaggerEngine.load(
        mesh=mesh,
        vae_checkpoint=args.vae_checkpoint,
        decoder_checkpoint=args.decoder_checkpoint,
        tags_csv_path=args.tags_csv_path,
        vae_config_path=args.vae_config_path,
        use_attention=not args.no_attention,
        mixed_precision=args.mixed_precision)
    if spatial:
        engine = engine.with_spatial_mesh(make_mesh(("model",)))
        print(f"spatial-parallel serving over {jax.device_count()} devices "
              f"(image height sharded; latency mode)")
        if args.transfer_format != "rgb":
            print("spatial parallelism uses RGB transfer "
                  "(--transfer_format yuv420 ignored)")
            args.transfer_format = "rgb"
    # micro-batch scales with the mesh: 8 sublane rows per device
    max_batch = args.max_batch or default_max_batch
    server = TaggerServer(engine, resolution=tuple(args.resolution),
                          threshold=args.confidence_threshold,
                          host=args.host, port=args.port,
                          max_batch=max_batch,
                          batch_timeout_ms=args.batch_timeout_ms,
                          request_timeout_s=args.request_timeout_s,
                          warmup=not args.no_warmup,
                          max_body_bytes=int(args.max_body_mb * 1024 * 1024),
                          max_queue=args.max_queue,
                          transfer_format=args.transfer_format)
    server.serve_forever()


if __name__ == "__main__":
    main()
