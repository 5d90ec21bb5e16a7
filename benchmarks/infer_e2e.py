#!/usr/bin/env python
"""End-to-end disk->JSON inference benchmark (VERDICT r2 gap #1).

Measures the REAL reference workload — a directory of image files through
``infer_and_classify`` to ``classification_results.json``
(/root/reference/infer_full.py:94-132) — not just device compute on
pre-staged buffers.  The image set is a mixed JPEG/PNG directory at
realistic camera-ish resolutions, generated once and cached in /tmp.

Also records the two roofline sides so the e2e number is explainable:
  - host decode throughput (the pipeline's decode stage alone)
  - device classify throughput (pre-staged uint8, batched, async chained)

Writes/merges the ``infer_full_e2e_1024px`` entry of benchmarks/report.json.
Run on the real TPU: plain ``python benchmarks/infer_e2e.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

CACHE_DIR = "/tmp/vt_bench_images_1024"
N_JPEG, N_PNG = 32, 16
RESOLUTION = 1024
BATCH = 8


def _make_image_dir() -> str:
    """48 mixed JPEG/PNG files, ~1.3-2.3 MP, smooth synthetic content."""
    from PIL import Image

    marker = os.path.join(CACHE_DIR, ".done")
    if os.path.exists(marker):
        return CACHE_DIR
    os.makedirs(CACHE_DIR, exist_ok=True)
    rng = np.random.default_rng(0)
    sizes = [(1536, 1152), (1280, 1600), (2048, 1152), (1440, 1440)]
    for i in range(N_JPEG + N_PNG):
        h, w = sizes[i % len(sizes)]
        img = np.cumsum(np.cumsum(rng.normal(size=(h // 8, w // 8, 3)),
                                  0), 1)
        img = ((img - img.min()) / (img.max() - img.min() + 1e-9) * 255
               ).astype(np.uint8)
        img = np.kron(img, np.ones((8, 8, 1), np.uint8))  # cheap upsample
        if i < N_JPEG:
            Image.fromarray(img).save(
                os.path.join(CACHE_DIR, f"img_{i:03d}.jpg"), quality=92)
        else:
            Image.fromarray(img).save(
                os.path.join(CACHE_DIR, f"img_{i:03d}.png"))
    open(marker, "w").close()
    return CACHE_DIR


from bench_common import build_full_engine as _full_engine  # noqa: E402


def main():
    from vae_tagger_tpu.data.bucketing import load_and_transform_image
    from vae_tagger_tpu.infer.classify import infer_and_classify

    image_dir = _make_image_dir()
    paths = sorted(os.listdir(image_dir))
    paths = [os.path.join(image_dir, p) for p in paths
             if not p.startswith(".")]
    n_images = len(paths)
    print(f"{n_images} images ({N_JPEG} JPEG + {N_PNG} PNG)")

    engine = _full_engine()

    # --- roofline side 1: host decode alone (single thread; the 1-core
    # host cannot exceed this no matter the pool size).  Split by format:
    # the set is 2/3 JPEG (DCT-scaled decode) and 1/3 PNG (full decode). ---
    def _decode_rate(subset):
        for p in subset[:2]:  # warm
            load_and_transform_image(p, resolution=RESOLUTION)
        t0 = time.perf_counter()
        for p in subset:
            load_and_transform_image(p, resolution=RESOLUTION)
        return (time.perf_counter() - t0) / len(subset) * 1000

    jpeg_ms = _decode_rate([p for p in paths if p.endswith(".jpg")][:12])
    png_ms = _decode_rate([p for p in paths if p.endswith(".png")][:12])
    decode_ms = (N_JPEG * jpeg_ms + N_PNG * png_ms) / (N_JPEG + N_PNG)

    # --- roofline side 2: device compute alone, inputs ON device, steps
    # chained in one program (run_all.py methodology — per-call dispatch
    # RTT through this harness's relay is ~100ms and host->device uint8
    # transfer is pathologically slow through it, see side 3) ---
    key = jax.random.key(1)
    reps = 4
    buf = jax.jit(lambda k: jax.random.randint(
        k, (reps, BATCH, RESOLUTION, RESOLUTION, 3), 0, 256,
        jnp.int32).astype(jnp.uint8))(key)

    @jax.jit
    def chained(buf):
        def body(i, acc):
            px = jax.lax.dynamic_index_in_dim(buf, i, 0, keepdims=False)
            _, probs = engine._encode_classify_fn(
                engine.vae_params, engine.decoder_variables, px)
            return acc + jnp.sum(probs)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jax.device_get(chained(buf))
    t0 = time.perf_counter()
    jax.device_get(chained(buf))
    device_ms = (time.perf_counter() - t0) / reps * 1000

    # --- roofline side 3: host->device transfer of one uint8 batch.
    # On a production TPU host this is PCIe DMA (~milliseconds for 25MB);
    # through this harness's remote-device relay it is the e2e bottleneck,
    # so it is measured and reported separately rather than silently
    # polluting the device number. ---
    rng = np.random.default_rng(1)
    host_block = rng.integers(0, 256, (BATCH, RESOLUTION, RESOLUTION, 3),
                              dtype=np.uint8)
    jax.device_get(jnp.sum(jnp.asarray(host_block)))  # warm path
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(jnp.sum(jnp.asarray(host_block)))
    transfer_ms = (time.perf_counter() - t0) / 3 * 1000

    # --- the real thing: directory of files -> classification JSON ---
    out_dir = "/tmp/vt_bench_e2e_out"
    infer_and_classify(engine, image_dir, output_dir=out_dir,
                       resolution=RESOLUTION, batch_size=BATCH,
                       verbose=False)  # warm run: compile + page cache
    t0 = time.perf_counter()
    results = infer_and_classify(engine, image_dir, output_dir=out_dir,
                                 resolution=RESOLUTION, batch_size=BATCH,
                                 verbose=False)
    wall = time.perf_counter() - t0
    assert len(results) == n_images
    e2e_ips = n_images / wall

    # --- the YUV 4:2:0 transfer path: 1.5 B/px on the wire (half of RGB),
    # chroma upsample + color conversion fused on device.  Attacks exactly
    # the two host-side costs above: decode (JPEGs skip libjpeg's color
    # conversion and resample chroma at quarter area) and transfer. ---
    from vae_tagger_tpu.data.bucketing import load_and_transform_image_yuv

    def _decode_rate_yuv(subset):
        for p in subset[:2]:
            load_and_transform_image_yuv(p, resolution=RESOLUTION)
        t0 = time.perf_counter()
        for p in subset:
            load_and_transform_image_yuv(p, resolution=RESOLUTION)
        return (time.perf_counter() - t0) / len(subset) * 1000

    yuv_jpeg_ms = _decode_rate_yuv(
        [p for p in paths if p.endswith(".jpg")][:12])
    yuv_png_ms = _decode_rate_yuv(
        [p for p in paths if p.endswith(".png")][:12])
    yuv_decode_ms = (N_JPEG * yuv_jpeg_ms + N_PNG * yuv_png_ms) / n_images

    y_block = host_block[..., 0].copy()
    cbcr_block = rng.integers(
        0, 256, (BATCH, 2, RESOLUTION // 2, RESOLUTION // 2),
        dtype=np.uint8)
    jax.device_get(jnp.sum(jnp.asarray(y_block))
                   + jnp.sum(jnp.asarray(cbcr_block)))  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        jax.device_get(jnp.sum(jnp.asarray(y_block))
                       + jnp.sum(jnp.asarray(cbcr_block)))
    yuv_transfer_ms = (time.perf_counter() - t0) / 3 * 1000

    infer_and_classify(engine, image_dir, output_dir=out_dir,
                       resolution=RESOLUTION, batch_size=BATCH,
                       verbose=False, transfer_format="yuv420")  # warm
    t0 = time.perf_counter()
    results_yuv = infer_and_classify(engine, image_dir, output_dir=out_dir,
                                     resolution=RESOLUTION, batch_size=BATCH,
                                     verbose=False, transfer_format="yuv420")
    wall_yuv = time.perf_counter() - t0
    assert len(results_yuv) == n_images
    yuv_ips = n_images / wall_yuv

    # roofline on a production host: transfer is PCIe-fast, so the pipeline
    # bound is max(decode, compute) per image.  On THIS harness the relay
    # transfer dominates; report both so the e2e figure is explainable.
    production_roofline = 1000 / max(decode_ms, device_ms / BATCH)
    harness_roofline = 1000 / max(decode_ms, device_ms / BATCH,
                                  transfer_ms / BATCH)
    entry = {
        "images_per_sec_e2e": round(e2e_ips, 2),
        "wall_s": round(wall, 2),
        "n_images": n_images,
        "mix": f"{N_JPEG} jpeg + {N_PNG} png, 1.3-2.3 MP sources",
        "host_decode_ms_per_image": round(decode_ms, 1),
        "host_decode_ms_jpeg": round(jpeg_ms, 1),
        "host_decode_ms_png": round(png_ms, 1),
        "device_compute_ms_per_image": round(device_ms / BATCH, 1),
        "relay_transfer_ms_per_image": round(transfer_ms / BATCH, 1),
        "harness_roofline_images_per_sec": round(harness_roofline, 1),
        "production_roofline_images_per_sec": round(production_roofline, 1),
        "note": ("disk->classification_results.json via infer_and_classify "
                 "(thread-pool decode + async dispatch, one batch in "
                 "flight).  This harness reaches its TPU through a remote "
                 "relay whose host->device uint8 path is ~100x slower than "
                 "PCIe; the e2e figure is bounded by that transfer, not by "
                 "the pipeline, and the relay's rate fluctuates run to run "
                 "(measured 60-82 ms/image across same-day runs — compare "
                 "rgb vs yuv420 within one run, not across runs).  The "
                 "production roofline (decode vs compute) is what the "
                 "pipeline achieves on a real host.  Its decode term is "
                 "the SERIAL single-core figure measured on this 1-core "
                 "host; it assumes only that a production host gives the "
                 "decode pool >= 1 core per TPU stream (decode_ms <= "
                 "compute_ms already holds serially, so any extra pool "
                 "scaling is headroom, not a requirement)."),
    }
    print(json.dumps(entry, indent=2))

    yuv_entry = {
        "images_per_sec_e2e": round(yuv_ips, 2),
        "wall_s": round(wall_yuv, 2),
        "host_decode_ms_per_image": round(yuv_decode_ms, 1),
        "host_decode_ms_jpeg": round(yuv_jpeg_ms, 1),
        "host_decode_ms_png": round(yuv_png_ms, 1),
        "relay_transfer_ms_per_image": round(yuv_transfer_ms / BATCH, 1),
        "speedup_vs_rgb_e2e": round(yuv_ips / e2e_ips, 2),
        "note": ("same workload through --transfer_format yuv420: planar "
                 "4:2:0 on the wire (1.5 B/px vs RGB's 3), JPEG decode "
                 "skips host color conversion, chroma resampled at quarter "
                 "area; RGB reconstituted on device.  Wins whenever host "
                 "decode or host->device bandwidth bound the pipeline."),
    }
    print(json.dumps(yuv_entry, indent=2))

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report["infer_full_e2e_1024px"] = entry
    report["infer_full_e2e_1024px_yuv420"] = yuv_entry
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
