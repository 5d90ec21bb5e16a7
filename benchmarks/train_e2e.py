#!/usr/bin/env python
"""End-to-end disk->step training benchmark (the training analogue of
benchmarks/infer_e2e.py).

Every published train number so far (report.json::train_full_bucketed_mix,
train_decoder_512px_batch4) times device compute on pre-staged batches.
The REAL reference workload (train_full.py:195-255) starts at a directory
of image files: per step the loader decodes 3*B triplet members, mines
positives/negatives, collates, and ships ~19 MB of uint8 to the device.
This measures that full pipeline — the real dataset/loader/steps stack,
one placed batch in flight like train/loop.py — and splits the roofline:

  - loader-only rate (host decode + triplet mining + collate)
  - host->device transfer of one collated triplet batch
  - device-only step rate (pre-staged batches, per-dispatch minus RTT)
  - e2e steps/s through the mirrored EpochLoop inner loop

Writes the ``train_full_e2e_512px`` entry of benchmarks/report.json.
Run on the real TPU: plain ``python benchmarks/train_e2e.py``.
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

from bench_common import (  # noqa: E402
    build_full_train_setup,
    fresh_full_state,
    measure_rtt,
)
from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

CORPUS_DIR = "/tmp/vt_bench_train_corpus"
N_IMAGES = 128
NUM_TAGS = 1000  # matches the class count behind every published number
RESOLUTION = 512
BATCH = 8


def _make_corpus() -> str:
    """N_IMAGES ~1.5 MP JPEGs + data.json (weighted tags) + tags.csv.

    Each image carries 3 tags drawn from the first 30 of 1000 (dense
    overlap so triplet mining always finds positives/negatives, like a
    real tag dataset's head-heavy distribution)."""
    from PIL import Image

    marker = os.path.join(CORPUS_DIR, ".done")
    if os.path.exists(marker):
        return CORPUS_DIR
    os.makedirs(CORPUS_DIR, exist_ok=True)
    rng = np.random.default_rng(0)
    sizes = [(1536, 1152), (1280, 1600), (1152, 1728)]
    data = {}
    for i in range(N_IMAGES):
        h, w = sizes[i % len(sizes)]
        img = np.cumsum(np.cumsum(rng.normal(size=(h // 8, w // 8, 3)),
                                  0), 1)
        img = ((img - img.min()) / (img.max() - img.min() + 1e-9) * 255
               ).astype(np.uint8)
        img = np.kron(img, np.ones((8, 8, 1), np.uint8))
        path = os.path.join(CORPUS_DIR, f"img_{i:03d}.jpg")
        Image.fromarray(img).save(path, quality=92)
        tags = rng.choice(30, size=3, replace=False)
        data[path] = ", ".join(
            f"tag_{t}:{rng.uniform(0.5, 1.0):.2f}" for t in tags)
    with open(os.path.join(CORPUS_DIR, "data.json"), "w") as f:
        json.dump(data, f)
    with open(os.path.join(CORPUS_DIR, "tags.csv"), "w") as f:
        f.write("name\n")
        f.writelines(f"tag_{i}\n" for i in range(NUM_TAGS))
    open(marker, "w").close()
    return CORPUS_DIR


def main():
    from vae_tagger_tpu.data.dataset import TaggedImageDataset
    from vae_tagger_tpu.data.loader import DataLoader
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.parallel.mesh import make_mesh, shard_batch
    from vae_tagger_tpu.train.steps import make_full_steps

    corpus = _make_corpus()
    rtt = measure_rtt()
    print(f"measured dispatch RTT: {rtt * 1e3:.1f} ms")

    dataset = TaggedImageDataset(
        json_path=os.path.join(corpus, "data.json"),
        tags_csv_path=os.path.join(corpus, "tags.csv"),
        resolution=RESOLUTION, return_triplets=True, seed=0)
    loader = DataLoader(dataset, BATCH, shuffle=True, num_workers=4,
                        prefetch_factor=2, seed=0)
    n_steps = len(loader)
    print(f"{N_IMAGES} images, {n_steps} steps/epoch at batch {BATCH}")

    # --- roofline side 1: loader alone (decode x3 + mining + collate).
    # First pass warms the page cache; second is the measured rate. ---
    for _ in loader:
        pass
    t0 = time.perf_counter()
    for _ in loader:
        pass
    loader_ms = (time.perf_counter() - t0) / n_steps * 1000

    # --- roofline side 2: host->device transfer of one collated batch
    # (through this harness's relay; PCIe DMA on a real host is ~3 ms) ---
    batch_np = next(iter(loader))
    batch_np.pop("global_real_count", None)
    nbytes = sum(np.asarray(v).nbytes for v in batch_np.values())

    def _place_sync(b):
        placed = {k: jnp.asarray(np.asarray(v)) for k, v in b.items()}
        jax.device_get(sum(jnp.sum(v) for v in placed.values()
                           if v.dtype != bool))
    _place_sync(batch_np)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        _place_sync(batch_np)
    transfer_ms = (time.perf_counter() - t0) / 3 * 1000

    # --- the model + step: the published fixture (full FLUX VAE, remat,
    # checkpointed encode, 1000-class head = the corpus tag count) ---
    vae, decoder, vp, dv, tx = build_full_train_setup(remat=True)
    train_step, _ = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True,
        compute_dtype=jnp.bfloat16, checkpoint_encode=True)
    mesh = make_mesh()
    base_rng = jax.random.key(0)

    # --- roofline side 3: device-only step rate, pre-staged batches,
    # per-dispatch minus RTT (train_full_mix methodology) ---
    state = fresh_full_state(vp, dv, tx)
    staged = []
    it = iter(loader)
    for _ in range(2):
        b = next(it)
        b.pop("global_real_count", None)
        staged.append(shard_batch(b, mesh))
    del it
    keys = jax.random.split(base_rng, 8)
    # TWO warm calls: the first compiles; the second compiles AGAIN for the
    # post-step state shardings (the donated state comes back with the
    # mesh's NamedSharding while the fresh one is single-device — timing
    # from the first warm call hides a full recompile in the loop)
    for i in range(2):
        state, m = train_step(state, staged[i % 2], keys[6 + i])
        jax.device_get(m["loss"])
    t0 = time.perf_counter()
    n = 4
    for i in range(n):
        state, m = train_step(state, staged[i % 2], keys[i])
        jax.device_get(m["loss"])
    device_ms = ((time.perf_counter() - t0) / n - rtt) * 1000
    del staged, state

    # --- the real thing: disk -> step, mirroring EpochLoop's inner loop
    # (placement one batch ahead of compute, metrics drained one step
    # late).  Epoch 1 warms everything; epoch 2 is measured. ---
    state = fresh_full_state(vp, dv, tx)

    def run_epoch(state, epoch):
        dataset.set_epoch(epoch)
        gs = 0
        pending = []

        def prefetched():
            prev = None
            for b in loader:
                b.pop("global_real_count", None)
                b = shard_batch(b, mesh)
                if prev is not None:
                    yield prev
                prev = b
            if prev is not None:
                yield prev

        t0 = time.perf_counter()
        for b in prefetched():
            state, metrics = train_step(
                state, b, jax.random.fold_in(base_rng, epoch * 100000 + gs))
            pending.append(metrics)
            if len(pending) > 1:
                jax.device_get(pending.pop(0))
            gs += 1
        for metrics in pending:
            jax.device_get(metrics)
        return state, time.perf_counter() - t0

    state, _ = run_epoch(state, 0)  # warm (compile reused from above)
    state, wall = run_epoch(state, 1)
    e2e_ms = wall / n_steps * 1000

    # --- the YUV 4:2:0 wire format (--transfer_format yuv420): half the
    # host->device bytes, ~2 ms/image of extra host conversion.  Same
    # loader seed -> same batch composition; compare within this run. ---
    dataset_yuv = TaggedImageDataset(
        json_path=os.path.join(corpus, "data.json"),
        tags_csv_path=os.path.join(corpus, "tags.csv"),
        resolution=RESOLUTION, return_triplets=True, seed=0,
        transfer_format="yuv420")
    loader_yuv = DataLoader(dataset_yuv, BATCH, shuffle=True, num_workers=4,
                            prefetch_factor=2, seed=0)
    for _ in loader_yuv:
        pass
    t0 = time.perf_counter()
    for _ in loader_yuv:
        pass
    loader_yuv_ms = (time.perf_counter() - t0) / n_steps * 1000

    batch_yuv = next(iter(loader_yuv))
    batch_yuv.pop("global_real_count", None)
    nbytes_yuv = sum(np.asarray(v).nbytes for v in batch_yuv.values())
    _place_sync(batch_yuv)
    t0 = time.perf_counter()
    for _ in range(3):
        _place_sync(batch_yuv)
    transfer_yuv_ms = (time.perf_counter() - t0) / 3 * 1000

    state = fresh_full_state(vp, dv, tx)
    loader = loader_yuv  # run_epoch closes over `loader`

    def run_epoch_yuv(state, epoch):
        dataset_yuv.set_epoch(epoch)
        return run_epoch(state, epoch)

    state, _ = run_epoch_yuv(state, 0)  # compile the yuv-batch program
    state, wall_yuv = run_epoch_yuv(state, 1)
    e2e_yuv_ms = wall_yuv / n_steps * 1000

    entry = {
        "ms_per_step_e2e": round(e2e_ms, 1),
        "triplet_img_per_sec_e2e": round(3 * BATCH * n_steps / wall, 2),
        "steps_per_epoch": n_steps,
        "loader_ms_per_step": round(loader_ms, 1),
        "relay_transfer_ms_per_batch": round(transfer_ms, 1),
        "batch_mb": round(nbytes / 1e6, 1),
        "device_ms_per_step": round(device_ms, 1),
        "rtt_ms": round(rtt * 1e3, 1),
        "pipeline_overhead_ms": round(e2e_ms - device_ms, 1),
        "yuv420": {
            "ms_per_step_e2e": round(e2e_yuv_ms, 1),
            "triplet_img_per_sec_e2e": round(
                3 * BATCH * n_steps / wall_yuv, 2),
            "loader_ms_per_step": round(loader_yuv_ms, 1),
            "relay_transfer_ms_per_batch": round(transfer_yuv_ms, 1),
            "batch_mb": round(nbytes_yuv / 1e6, 1),
            "speedup_vs_rgb_e2e": round(e2e_ms / e2e_yuv_ms, 2),
        },
        "note": ("disk->step through the real dataset/loader/step stack "
                 "(512px bs8 triplets, remat, focal simplified loss), "
                 "mirroring train/loop.py's one-placed-batch-ahead inner "
                 "loop; device side per-dispatch minus measured RTT.  The "
                 "relay's host->device path (~45 MB/s, CPU-burning) is a "
                 "harness artifact — on a PCIe host transfer is ~3 ms and "
                 "the loader rate is the only host-side bound.  The relay "
                 "rate swings a lot between runs, so the rgb e2e figure "
                 "swings with it (measured 962-1233 ms/step across runs); "
                 "the yuv420 e2e is stable (921-922 ms) because half the "
                 "bytes halves the exposure — compare rgb vs yuv420 within "
                 "one run only."),
    }
    print(json.dumps(entry, indent=2))

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report["train_full_e2e_512px"] = entry
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
