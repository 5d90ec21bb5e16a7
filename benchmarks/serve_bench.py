#!/usr/bin/env python
"""Serving benchmark: sustained throughput + latency under concurrency.

The reference's batch-serving story is a subprocess per image
(/root/reference/batch_inference_test.py:17-30) — model reload + batch-1
dispatch every time.  Ours is a resident HTTP server with dynamic
micro-batching (serve/server.py).  This measures, over real HTTP on
localhost with N concurrent clients:

  - micro-batched serving (max_batch = 8): sustained img/s, p50/p95 latency
  - forced batch-1 serving (max_batch = 1): the no-coalescing ablation

and writes the ``serving_512px`` entry of benchmarks/report.json.

Run on the real TPU: ``python benchmarks/serve_bench.py``.
"""

from __future__ import annotations

import concurrent.futures
import io
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

RESOLUTION = 512
CLIENTS = 16
REQUESTS_PER_CLIENT = 6


from bench_common import build_full_engine as _engine  # noqa: E402


def _jpeg_payload():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = np.cumsum(np.cumsum(rng.normal(size=(96, 128, 3)), 0), 1)
    img = ((img - img.min()) / (img.max() - img.min()) * 255).astype(np.uint8)
    img = np.kron(img, np.ones((8, 8, 1), np.uint8))  # 768x1024 source
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=90)
    return buf.getvalue()


def _drive(server, payload):
    url = f"http://127.0.0.1:{server.port}/classify"

    def one():
        t0 = time.perf_counter()
        req = urllib.request.Request(url, data=payload, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            json.load(r)
        return time.perf_counter() - t0

    one()  # connection + program warm
    lat = []
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(CLIENTS) as ex:
        futs = [ex.submit(one)
                for _ in range(CLIENTS * REQUESTS_PER_CLIENT)]
        for f in concurrent.futures.as_completed(futs):
            lat.append(f.result())
    wall = time.perf_counter() - t0
    lat_ms = np.sort(np.asarray(lat)) * 1000
    n = len(lat_ms)
    return {
        "images_per_sec": round(n / wall, 2),
        "p50_ms": round(float(lat_ms[n // 2]), 1),
        "p95_ms": round(float(lat_ms[int(n * 0.95)]), 1),
        "requests": n,
        "concurrent_clients": CLIENTS,
    }


def main():
    from vae_tagger_tpu.serve import TaggerServer

    engine = _engine()
    payload = _jpeg_payload()

    results = {"resolution": RESOLUTION}
    for label, max_batch, fmt in (("micro_batched", 8, "rgb"),
                                  ("micro_batched_yuv420", 8, "yuv420"),
                                  ("batch1_ablation", 1, "rgb")):
        with TaggerServer(engine, resolution=RESOLUTION, threshold=0.0,
                          host="127.0.0.1", port=0, max_batch=max_batch,
                          batch_timeout_ms=10, max_queue=256,
                          transfer_format=fmt,
                          warmup=(max_batch == 8)) as server:
            results[label] = _drive(server, payload)
            print(label, results[label], flush=True)
    results["micro_batching_speedup"] = round(
        results["micro_batched"]["images_per_sec"]
        / results["batch1_ablation"]["images_per_sec"], 2)
    results["yuv420_speedup"] = round(
        results["micro_batched_yuv420"]["images_per_sec"]
        / results["micro_batched"]["images_per_sec"], 2)

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report["serving_512px"] = results
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
