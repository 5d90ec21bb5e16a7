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


def _drive_mixed(server, payload, mix=((512, 12), (1024, 4)),
                 requests_per_client=4):
    """Two-resolution client mix against ONE server: per-shape latency under
    cross-shape contention (the fairness claim under test: server.py's
    oldest-head-first cross-shape FIFO, serve/server.py::_take_batch)."""
    def one(res):
        url = f"http://127.0.0.1:{server.port}/classify?resolution={res}"
        t0 = time.perf_counter()
        req = urllib.request.Request(url, data=payload, method="POST",
                                     headers={"X-Timing": "1"})
        with urllib.request.urlopen(req, timeout=600) as r:
            body = json.load(r)
        return res, time.perf_counter() - t0, body.get("timing_ms", {})

    for res, _ in mix:
        one(res)  # warm both programs + connections
    lat = {res: [] for res, _ in mix}
    timings = {res: [] for res, _ in mix}
    total_clients = sum(n for _, n in mix)
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(total_clients) as ex:
        futs = [ex.submit(one, res)
                for res, n in mix
                for _ in range(n * requests_per_client)]
        for f in concurrent.futures.as_completed(futs):
            res, dt, timing = f.result()
            lat[res].append(dt)
            timings[res].append(timing)
    wall = time.perf_counter() - t0
    out = {"total_images_per_sec": round(sum(len(v) for v in lat.values())
                                         / wall, 2),
           "concurrent_clients": {str(res): n for res, n in mix}}
    for res, vals in lat.items():
        ms = np.sort(np.asarray(vals)) * 1000
        out[f"{res}px"] = {
            "requests": len(ms),
            "p50_ms": round(float(np.percentile(ms, 50)), 1),
            # interpolated: with only n*clients samples on the minority
            # shape, the order-statistic index floor(0.95n) is the MAX and
            # one outlier request would fake a starvation signal
            "p95_ms": round(float(np.percentile(ms, 95)), 1),
            "max_ms": round(float(ms[-1]), 1),
        }
        # latency attribution from the server's own stamps (queue wait vs
        # device pipeline), keyed to the straggler: the max-latency
        # request's split names its cause — head-of-line queueing behind
        # an older (possibly other-shape) batch shows up as queue_wait
        qw = np.asarray([t.get("queue_wait_ms", np.nan) for t in
                         timings[res]], float)
        dp = np.asarray([t.get("device_pipeline_ms", np.nan) for t in
                         timings[res]], float)
        total = np.asarray(lat[res]) * 1000
        worst = int(np.argmax(total))
        out[f"{res}px"]["decomposition"] = {
            "queue_wait_p50_ms": round(float(np.nanpercentile(qw, 50)), 1),
            "queue_wait_max_ms": round(float(np.nanmax(qw)), 1),
            "device_pipeline_p50_ms": round(float(np.nanpercentile(dp, 50)),
                                            1),
            "device_pipeline_max_ms": round(float(np.nanmax(dp)), 1),
            "worst_request": {
                "total_ms": round(float(total[worst]), 1),
                "queue_wait_ms": round(float(qw[worst]), 1),
                "device_pipeline_ms": round(float(dp[worst]), 1),
            },
        }
    # starvation indicator: the minority shape's p95 must stay within the
    # FIFO bound — at most ~(its own batch + one max_batch drain of every
    # younger same-epoch majority batch) — we record the ratio vs the
    # majority's p95; >> 3 would mean the minority is being starved
    p95s = [out[f"{res}px"]["p95_ms"] for res, _ in mix]
    out["minority_vs_majority_p95_ratio"] = round(p95s[1] / p95s[0], 2)
    return out


def main():
    from vae_tagger_tpu.serve import TaggerServer

    mixed_only = "--mixed_only" in sys.argv[1:]
    engine = _engine()
    payload = _jpeg_payload()

    results = {"resolution": RESOLUTION}
    for label, max_batch, fmt in () if mixed_only else (
                                  ("micro_batched", 8, "rgb"),
                                  ("micro_batched_yuv420", 8, "yuv420"),
                                  ("batch1_ablation", 1, "rgb")):
        with TaggerServer(engine, resolution=RESOLUTION, threshold=0.0,
                          host="127.0.0.1", port=0, max_batch=max_batch,
                          batch_timeout_ms=10, max_queue=256,
                          transfer_format=fmt,
                          warmup=(max_batch == 8)) as server:
            results[label] = _drive(server, payload)
            print(label, results[label], flush=True)
    if not mixed_only:
        results["micro_batching_speedup"] = round(
            results["micro_batched"]["images_per_sec"]
            / results["batch1_ablation"]["images_per_sec"], 2)
        results["yuv420_speedup"] = round(
            results["micro_batched_yuv420"]["images_per_sec"]
            / results["micro_batched"]["images_per_sec"], 2)

    # mixed-shape fairness: a 512px majority flood + 1024px minority
    # against one server holding both compiled programs (VERDICT r3 #10)
    with TaggerServer(engine, resolution=(512, 1024), threshold=0.0,
                      host="127.0.0.1", port=0, max_batch=8,
                      batch_timeout_ms=10, max_queue=256,
                      warmup=True) as server:
        mixed = _drive_mixed(server, payload)
        print("serving_mixed", mixed, flush=True)

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    if not mixed_only:  # --mixed_only: refresh only the fairness entry
        report["serving_512px"] = results
    report["serving_mixed"] = mixed
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
