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


def main():
    p = argparse.ArgumentParser(description="vae-tagger HTTP server")
    p.add_argument("--vae_checkpoint", type=str, required=True)
    p.add_argument("--decoder_checkpoint", type=str, required=True)
    p.add_argument("--tags_csv_path", type=str, required=True)
    p.add_argument("--vae_config_path", type=str, default=None)
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--confidence_threshold", type=float, default=0.5)
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--batch_timeout_ms", type=float, default=10.0)
    p.add_argument("--request_timeout_s", type=float, default=600.0)
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--no_attention", action="store_true")
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=[None, "no", "fp16", "bf16"])
    args = p.parse_args()

    from vae_tagger_tpu.infer.engine import TaggerEngine
    from vae_tagger_tpu.serve import TaggerServer

    engine = TaggerEngine.load(
        vae_checkpoint=args.vae_checkpoint,
        decoder_checkpoint=args.decoder_checkpoint,
        tags_csv_path=args.tags_csv_path,
        vae_config_path=args.vae_config_path,
        use_attention=not args.no_attention,
        mixed_precision=args.mixed_precision)
    server = TaggerServer(engine, resolution=args.resolution,
                          threshold=args.confidence_threshold,
                          host=args.host, port=args.port,
                          max_batch=args.max_batch,
                          batch_timeout_ms=args.batch_timeout_ms,
                          request_timeout_s=args.request_timeout_s,
                          warmup=not args.no_warmup)
    server.serve_forever()


if __name__ == "__main__":
    main()
