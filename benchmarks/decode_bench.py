"""VAE DECODE throughput on the chip — the half of the model every report
entry so far leaves unmeasured.

Every published number (bench.py headline, per-stage table, e2e inference)
exercises encode+tag; decode only appears inside training losses.  But the
decoder is its own user surface: ``scripts/vae_reconstruction_test.py``
(reference vae_reconstruction_test.py:60-160) and ``train_vae``'s recon
term run it at full resolution, and it is the EXPENSIVE half — the
diffusers decoder mirrors the encoder's block stack at 2x the spatial area
per stage (upsample-then-conv vs conv-then-downsample), so cost analysis
puts it at ~3.4x the encode FLOPs.

Measures, batch 8 bf16 sustained (same fori_loop methodology as
run_all.py):
  - decode alone (latent -> image) at 512px and 1024px output, with
    XLA-cost-analysis TFLOP/image and MFU against the v5e's 197 TFLOP/s;
  - the full reconstruction round trip (uint8 -> encode -> mode -> decode),
    the exact compute of vae_reconstruction_test.py.

Writes report.json::vae_decode.  Run on the TPU host env (plain python).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from bench_common import measure_rtt  # noqa: F401  (import sets sys.path)

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPORT = os.path.join(REPO, "benchmarks", "report.json")
V5E_BF16_PEAK_TFLOPS = 197.0
RNG = np.random.default_rng(0)


def sustained_ms(fn, params, buf, reps=6):
    """ms per call: reps chained in one jitted fori_loop, one sync.

    ``buf`` holds ``reps`` DISTINCT stacked inputs and each iteration
    indexes its own (run_all.py methodology) — a single reused input lets
    XLA hoist the loop-invariant body and report impossible MFU (>1,
    observed).  ``params`` is an explicit argument: closing over the
    ~300 MB fp32 param tree embeds it as HLO constants, which overflows
    the relay's remote_compile request limit (HTTP 413, observed)."""
    @jax.jit
    def chained(p, b):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(b, i, axis=0, keepdims=False)
            return acc + jnp.sum(fn(p, x).astype(jnp.float32))
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    jax.device_get(chained(params, buf))  # compile
    t0 = time.perf_counter()
    jax.device_get(chained(params, buf))
    return (time.perf_counter() - t0) / reps * 1000


def tflops_of(fn, params, arg) -> float:
    cost = jax.jit(fn).lower(params, arg).compile().cost_analysis()
    return float(cost.get("flops", 0.0)) / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_report", action="store_true")
    args = ap.parse_args()

    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.core.precision import BF16
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    from vae_tagger_tpu.ops.image import normalize_uint8

    cfg = default_flux_vae_config()
    vae = AutoencoderKL(cfg, dtype=BF16.compute_dtype)
    vp = jax.jit(vae.init)({"params": jax.random.key(0)},
                           jnp.zeros((1, 256, 256, 3)),
                           jax.random.key(1))["params"]

    def decode(p, z):
        return vae.apply({"params": p}, z, method=AutoencoderKL.decode)

    def round_trip(p, px):
        x = normalize_uint8(px, jnp.bfloat16)
        post = vae.apply({"params": p}, x, method=AutoencoderKL.encode)
        return decode(p, post.mode())

    results = {}
    batch, reps = 8, 6
    for out_px in (512, 1024):
        s = out_px // 8  # f8 VAE: latent grid
        # generate bench inputs ON DEVICE (host->relay transfer is ~45 MB/s)
        z = jax.jit(lambda: jax.random.normal(
            jax.random.key(3), (reps, batch, s, s, cfg.latent_channels),
            jnp.bfloat16))()
        dt = sustained_ms(decode, vp, z, reps)
        tf = tflops_of(decode, vp, z[0]) / batch
        ips = batch / (dt / 1000)
        results[f"decode_{out_px}px_batch8"] = {
            "ms_per_batch": round(dt, 1),
            "images_per_sec": round(ips, 1),
            "tflops_per_image": round(tf, 2),
            "mfu": round(ips * tf / V5E_BF16_PEAK_TFLOPS, 3),
        }
        print(f"decode {out_px}px:", results[f"decode_{out_px}px_batch8"])

        px = jax.jit(lambda: jax.random.randint(
            jax.random.key(4), (reps, batch, out_px, out_px, 3),
            0, 256, jnp.uint8))()
        dt = sustained_ms(round_trip, vp, px, reps)
        tf = tflops_of(round_trip, vp, px[0]) / batch
        ips = batch / (dt / 1000)
        results[f"reconstruct_{out_px}px_batch8"] = {
            "ms_per_batch": round(dt, 1),
            "images_per_sec": round(ips, 1),
            "tflops_per_image": round(tf, 2),
            "mfu": round(ips * tf / V5E_BF16_PEAK_TFLOPS, 3),
        }
        print(f"reconstruct {out_px}px:",
              results[f"reconstruct_{out_px}px_batch8"])

    results["note"] = (
        "decode: latent -> uint8-scale image, the vae_reconstruction_test/"
        "train_vae compute; reconstruct: uint8 -> encode -> mode -> decode "
        "round trip.  batch 8 bf16, sustained fori_loop, v5e.  MFU vs the "
        "197 TFLOP/s bf16 nameplate with XLA cost-analysis FLOPs.")
    print(json.dumps(results, indent=2))
    if not args.skip_report:
        with open(REPORT) as f:
            report = json.load(f)
        report["vae_decode"] = results
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=2)
        print(f"updated {REPORT}::vae_decode")


if __name__ == "__main__":
    main()
