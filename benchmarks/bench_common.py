"""Shared helpers for the benchmark scripts (run as scripts from this
directory, so plain ``from bench_common import ...`` resolves).

Two pieces of methodology are load-bearing for every reported number
(docs/PERF.md, CLAUDE.md round-3 notes) and must not drift between copies:

- measure_rtt(): the tunneled backend adds ~30 ms of dispatch round-trip
  per device_get; per-dispatch step timings subtract this MEASURED value
  (a trivial jitted scalar round trip) rather than assuming one.
- build_full_engine(): the full-size FLUX VAE + 1000-class attention
  tagger used by the serving and e2e-inference benches (random weights —
  throughput does not depend on the values).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import jax
import jax.numpy as jnp


def run_logged(argv, log_path, env=None, cwd=REPO_ROOT, echo=4):
    """Run a CLI, teeing combined stdout+stderr to ``log_path``; raise on
    failure (tail included).  Returns (stdout, wall_seconds).  One
    definition shared by the accuracy/parity drivers (accuracy.py,
    ref_accuracy_cpu.py) so log/error handling cannot drift."""
    suffix = " ..." if len(argv) > echo else ""
    print(f"$ {' '.join(argv[:echo])}{suffix} "
          f"(log: {os.path.relpath(log_path, REPO_ROOT)})", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(argv, cwd=cwd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    with open(log_path, "w") as f:
        f.write(proc.stdout)
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-5000:])
        raise RuntimeError(f"{' '.join(argv[:2])} failed "
                           f"rc={proc.returncode}; full log: {log_path}")
    dt = time.perf_counter() - t0
    print(f"  done in {dt:.0f}s", flush=True)
    return proc.stdout, dt


def measure_rtt(reps: int = 10) -> float:
    """Seconds of per-dispatch round trip through the relay (jitted scalar
    add, synced with jax.device_get like the timed loops it corrects)."""
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.float32(0)
    jax.device_get(tiny(z))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_get(tiny(z))
    return (time.perf_counter() - t0) / reps


def _build_full_models(remat: bool = False):
    """One definition of the full-size model pair (FLUX VAE + 1000-class
    attention tagger, bf16, init keys 0/1/2) shared by the train and
    inference fixtures below, so the shapes behind every published number
    cannot drift between scripts."""
    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.core.precision import BF16
    from vae_tagger_tpu.infer.engine import build_decoder
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = default_flux_vae_config()
    vae = AutoencoderKL(cfg, dtype=BF16.compute_dtype, remat=remat)
    decoder = build_decoder(1000, use_attention=True, latent_channels=16,
                            policy=BF16)
    vp = jax.jit(vae.init)({"params": jax.random.key(0)},
                           jnp.zeros((1, 256, 256, 3)),
                           jax.random.key(1))["params"]
    dv = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 32, 32, 16)),
        deterministic=True)
    return vae, decoder, vp, dv


def build_full_train_setup(remat: bool = True):
    """Full-size FLUX VAE (+remat) + 1000-class attention tagger + AdamW:
    the shared fixture for every train-step benchmark (probe_512_full,
    train_full_mix, bs1_*).  Returns (vae, decoder, vae_params,
    decoder_variables, tx)."""
    import optax

    from vae_tagger_tpu.train.state import build_optimizer

    vae, decoder, vp, dv = _build_full_models(remat=remat)
    tx = build_optimizer(optax.constant_schedule(1e-3), 1e-6, 1.0, 1)
    return vae, decoder, vp, dv, tx


def make_triplet_batch(rng, b: int, h: int, w: int, num_classes: int = 1000):
    """One random uint8 triplet batch with ~5%-positive labels (the label
    sparsity every published train number was measured at)."""
    import numpy as np

    fb = {k: jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
          for k in ("anchor", "positive", "negative")}
    fb["labels"] = jnp.asarray(
        (rng.random((b, num_classes)) > 0.95).astype(np.float32))
    fb["positive_labels"] = fb["labels"]
    return fb


def fresh_full_state(vp, dv, tx):
    """A fresh (deep-copied) TrainState for {'vae','decoder'} params —
    steps donate their state, so each timed config needs its own copy."""
    from vae_tagger_tpu.train.state import TrainState

    fresh = jax.tree.map(jnp.array, dv)
    return TrainState.create(
        {"vae": jax.tree.map(jnp.array, vp), "decoder": fresh["params"]},
        tx, batch_stats=fresh.get("batch_stats"))


def build_full_engine():
    """Full-size FLUX VAE + 1000-class attention tagger in a TaggerEngine."""
    from vae_tagger_tpu.core.precision import BF16
    from vae_tagger_tpu.infer.engine import TaggerEngine

    vae, decoder, vp, dv = _build_full_models()
    return TaggerEngine(vae=vae, vae_params=vp, decoder=decoder,
                        decoder_variables=dict(dv),
                        tag_names=[f"tag_{i}" for i in range(1000)],
                        policy=BF16)
