"""2-process jax.distributed integration test (CPU, local coordinator).

VERDICT round-1 item 7: exercise the REAL multi-process path end-to-end —
initialize_distributed -> make_mesh over 2 processes x 1 device ->
shard_batch via make_array_from_process_local_data -> one sharded
train_full step -> collective Orbax checkpoint save — and assert both
processes compute identical losses.  (The simulated per-process loader
slicing is covered in test_data.py; this covers the actual process group.)
"""

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["VT_REPO"])
from vae_tagger_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, replicated_sharding, shard_batch,
    is_main_process)
initialize_distributed()  # env-configured coordinator (the real path)

import jax
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2

import optax
from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.io.orbax_io import save_train_state
from vae_tagger_tpu.losses.combined import LossConfig
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.train.state import TrainState, build_optimizer
from vae_tagger_tpu.train.steps import make_full_steps

cfg = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                              norm_num_groups=4, latent_channels=16,
                              sample_size=32)
vae = AutoencoderKL(cfg)
decoder = build_decoder(num_classes=8, use_attention=True,
                        latent_channels=16)
mesh = make_mesh()
rep = replicated_sharding(mesh)

def init_state():
    vp = vae.init({"params": jax.random.key(0)}, jnp.zeros((1, 32, 32, 3)),
                  jax.random.key(1))["params"]
    dv = decoder.init({"params": jax.random.key(2)},
                      jnp.zeros((1, 4, 4, 16)), deterministic=True)
    return vp, dv

# params materialize identically on every process, replicated on the mesh
vp, dv = jax.jit(init_state, out_shardings=rep)()
tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)
state = TrainState.create({"vae": vp, "decoder": dv["params"]}, tx,
                          batch_stats=dv.get("batch_stats"))
state = jax.tree.map(
    lambda x: x if hasattr(x, "sharding") and not isinstance(
        x, (int, float)) else jax.device_put(x, rep), state)

# global batch 4, each process provides its contiguous half (rows 2p:2p+2)
p = jax.process_index()
g = np.random.default_rng(0)
full = {
    "anchor": g.integers(0, 255, (4, 32, 32, 3), np.uint8),
    "positive": g.integers(0, 255, (4, 32, 32, 3), np.uint8),
    "negative": g.integers(0, 255, (4, 32, 32, 3), np.uint8),
    "labels": g.random((4, 8), np.float32),
    "positive_labels": g.random((4, 8), np.float32),
}
local = {k: v[2 * p:2 * p + 2] for k, v in full.items()}
batch = shard_batch(local, mesh)

train_step, _ = make_full_steps(vae, decoder, LossConfig(use_focal_loss=True),
                                use_simplified=True)
state, metrics = train_step(state, batch, jax.random.key(3))
loss = float(jax.device_get(metrics["loss"]))

ckpt_dir = os.path.join(os.environ["VT_OUT"], "ckpt")
save_train_state(state, ckpt_dir)  # collective across both processes

print(json.dumps({"process": p, "loss": loss,
                  "main": is_main_process(),
                  "ckpt_exists": os.path.isdir(ckpt_dir)}), flush=True)
"""


def test_two_process_distributed_train_step(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    addr = f"localhost:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for p in (0, 1):
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": addr,
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(p),
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "VT_REPO": REPO,
            "VT_OUT": str(tmp_path),
            "PYTHONPATH": REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=900)
        outs.append(out)
        assert proc.returncode == 0, out

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))
    results.sort(key=lambda r: r["process"])
    assert [r["process"] for r in results] == [0, 1]
    assert results[0]["main"] and not results[1]["main"]
    # SPMD: the global loss must be identical on both processes
    assert results[0]["loss"] == results[1]["loss"]
    assert all(r["ckpt_exists"] for r in results)
