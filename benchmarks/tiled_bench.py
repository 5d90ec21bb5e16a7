#!/usr/bin/env python
"""Native-resolution tiled encode benchmark (infer/tiled.py).

A direct encode of a 3072x2048 image needs ~3.4x the activation memory of
the 1024px path per stage-0 tensor and grows unboundedly with input size;
the tiled path runs any size through one compiled (8, tile, tile, 3)
program.  Measures wall-clock megapixels/sec for a 6-megapixel native
encode on the chip (incl. host blend + relay transfer) and the device-only
tile-batch rate, writing ``tiled_encode_native`` to report.json.

Run on the real TPU: plain ``python benchmarks/tiled_bench.py``.
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

from bench_common import _build_full_models, measure_rtt  # noqa: E402
from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

H, W = 2048, 3072
TILE, OVERLAP = 1024, 256


def main():
    from vae_tagger_tpu.infer.tiled import TiledVAE, tile_starts

    rtt = measure_rtt()
    vae, _, vp, _ = _build_full_models()
    tiler = TiledVAE(vae, vp, tile=TILE, overlap=OVERLAP)

    rng = np.random.default_rng(0)
    img = np.cumsum(np.cumsum(rng.normal(size=(H // 8, W // 8, 3)), 0), 1)
    img = ((img - img.min()) / (img.max() - img.min() + 1e-9) * 255
           ).astype(np.uint8)
    img = np.kron(img, np.ones((8, 8, 1), np.uint8))

    n_tiles = (len(tile_starts(H, TILE, TILE - OVERLAP))
               * len(tile_starts(W, TILE, TILE - OVERLAP)))

    z = tiler.encode(img)  # warm: compile + one full pass
    assert z.shape == (H // 8, W // 8, 16) and np.isfinite(z).all()
    t0 = time.perf_counter()
    z = tiler.encode(img)
    wall = time.perf_counter() - t0

    # device-only side: one staged 8-tile batch, chained (the blend and
    # the relay transfer are excluded — this is the tile-encode roofline)
    buf = jax.jit(lambda k: jax.random.randint(
        k, (8, TILE, TILE, 3), 0, 256, jnp.int32).astype(jnp.uint8))(
        jax.random.key(1))

    # reuse the tiler's jitted chunk directly (per-dispatch, minus RTT)
    jax.device_get(tiler._encode_chunk(vp, buf))
    t0 = time.perf_counter()
    for _ in range(4):
        jax.device_get(jnp.sum(tiler._encode_chunk(vp, buf)))
    device_batch_ms = ((time.perf_counter() - t0) / 4 - rtt) * 1000

    mp = H * W / 1e6
    entry = {
        "image": f"{W}x{H} ({mp:.1f} MP), tile {TILE}, overlap {OVERLAP}",
        "n_tiles": n_tiles,
        "wall_s_e2e": round(wall, 2),
        "megapixels_per_sec_e2e": round(mp / wall, 2),
        "device_ms_per_8tile_batch": round(device_batch_ms, 1),
        "device_megapixels_per_sec": round(
            8 * TILE * TILE / 1e6 / (device_batch_ms / 1000), 1),
        "rtt_ms": round(rtt * 1e3, 1),
        "note": ("native-resolution encode through fixed-shape overlapping "
                 "tiles (one compiled program, HBM bounded by one 8-tile "
                 "batch); e2e includes the host blend and this harness's "
                 "slow relay transfer of the tile stack"),
    }
    print(json.dumps(entry, indent=2))

    out = os.path.join(os.path.dirname(__file__), "report.json")
    report = {}
    if os.path.exists(out):
        with open(out) as f:
            report = json.load(f)
    report["tiled_encode_native"] = entry
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report updated: {out}")


if __name__ == "__main__":
    main()
