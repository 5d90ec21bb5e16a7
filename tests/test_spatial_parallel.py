"""Spatial (latency-mode) partitioned inference over the virtual CPU mesh.

``TaggerEngine.with_spatial_mesh`` shards the image HEIGHT across a mesh
axis so one image's VAE encode is computed by all chips cooperatively
(GSPMD halo exchange for the convs, psum for the GroupNorm reductions,
K/V all-gather in the mid-block attention) — the latency complement to the
throughput-mode ``with_mesh`` data parallelism.  The reference has no
equivalent: Accelerate DDP cannot split a single image
(/root/reference/infer_full.py:94-105 runs batch-1 on one device).

These tests assert numerics against the single-device engine on the
8-virtual-device CPU mesh, for both a pure latency mesh ('model',) and a
2-D throughput x latency mesh ('data', 'model').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer import TaggerEngine
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.parallel.mesh import make_mesh

# 64px so the latent grid (64/8 = 8 rows) splits evenly 8 ways at the
# pixel level: H % (downsample * shards) == 64 % 64 == 0
CFG = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                              norm_num_groups=4, latent_channels=16,
                              sample_size=64)


@pytest.fixture(scope="module")
def engine():
    model = AutoencoderKL(CFG)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jax.random.key(1))["params"]
    decoder = build_decoder(5, use_attention=True, latent_channels=16)
    variables = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 16)),
        deterministic=True)
    return TaggerEngine(vae=model, vae_params=params, decoder=decoder,
                        decoder_variables=dict(variables),
                        tag_names=[f"t{i}" for i in range(5)])


@pytest.fixture(scope="module")
def spatial(engine):
    assert jax.device_count() >= 8, "conftest pins 8 virtual CPU devices"
    return engine.with_spatial_mesh(make_mesh(("model",)))


@pytest.fixture(scope="module")
def grid(engine):
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    return engine.with_spatial_mesh(mesh)


def test_spatial_classify_matches_single_device(engine, spatial, rng):
    px = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    ref = engine.classify(px)
    out = spatial.classify(px)
    assert out.shape == ref.shape == (3, 5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spatial_encode_matches_single_device(engine, spatial, rng):
    px = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    ref = engine.encode(px)
    out = spatial.encode(px)
    assert out.shape == ref.shape == (2, 8, 8, 16)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_spatial_does_not_pad_the_batch(spatial, rng):
    # latency mode must not round a lone image up to 8 sublane rows — that
    # would multiply its latency by 8, the opposite of the mode's point
    assert spatial.pad_multiple() == 1
    px = rng.integers(0, 256, (1, 64, 64, 3), dtype=np.uint8)
    placed = spatial._place(px)
    assert placed.shape[0] == 1
    # the single image IS spread over every device (H sharded)
    assert len(placed.sharding.device_set) == jax.device_count()


def test_grid_mesh_classify_matches_single_device(engine, grid, rng):
    # 2-D mesh: batch over 'data' (2), height over 'model' (4)
    px = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    ref = engine.classify(px)
    out = grid.classify(px)
    np.testing.assert_allclose(out, ref, atol=1e-5)
    assert grid.pad_multiple() == 2  # batch pads to the data-axis extent


def test_grid_mesh_pads_odd_batch_on_data_axis(engine, grid, rng):
    px = rng.integers(0, 256, (3, 64, 64, 3), dtype=np.uint8)
    ref = engine.classify(px)
    out = grid.classify(px)  # padded to 4 internally, pad row dropped
    assert out.shape == ref.shape == (3, 5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_indivisible_height_is_rejected(spatial, rng):
    # 32px over 8 shards would leave the latent grid (4 rows) under-split;
    # a clear error beats silent GSPMD padding with unpredictable perf
    px = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="divisible"):
        spatial.classify(px)


def test_missing_axis_is_rejected(engine):
    with pytest.raises(ValueError, match="no axis"):
        engine.with_spatial_mesh(make_mesh(("data",)))


def test_spatial_engine_serves_http(engine, spatial):
    """serve.py --spatial_parallel fronts a height-sharded engine; the HTTP
    path (decode -> batching worker -> spatial classify) must match the
    single-device engine per image."""
    import io
    import json
    import urllib.request

    from PIL import Image

    from vae_tagger_tpu.serve import TaggerServer

    def jpeg(seed):
        r = np.random.default_rng(seed)
        img = Image.fromarray(r.integers(0, 255, (80, 72, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=95)
        return buf.getvalue()

    with TaggerServer(spatial, resolution=64, threshold=0.0,
                      host="127.0.0.1", port=0, max_batch=2,
                      batch_timeout_ms=10) as server:
        outs = []
        for i in range(2):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}/classify",
                data=jpeg(i), method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                outs.append(json.load(r))

    from vae_tagger_tpu.data.bucketing import decode_bytes_square

    px = np.stack([decode_bytes_square(jpeg(i), 64) for i in range(2)])
    ref = engine.classify(px)
    for i, out in enumerate(outs):
        got = {t["tag"]: t["confidence"] for t in out["predicted_tags"]}
        for j, name in enumerate(engine.tag_names):
            assert abs(got[name] - float(ref[i, j])) <= 1e-3, (i, name)


def _tiny_full_state_and_steps():
    import optax

    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.state import TrainState
    from vae_tagger_tpu.train.steps import make_full_steps
    from vae_tagger_tpu.train.train_decoder import _init_decoder_variables

    model = AutoencoderKL(CFG)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jax.random.key(1))["params"]
    decoder = build_decoder(5, use_attention=True, latent_channels=16)
    variables = _init_decoder_variables(decoder, 16)

    def fresh_state():
        # SGD, not Adam: params with mathematically-zero gradients (e.g. a
        # conv bias feeding BatchNorm) would have Adam normalize sharded
        # reduction noise into sign-random +-lr updates; SGD keeps updates
        # proportional to gradients so the parity comparison is meaningful
        tx = optax.sgd(1e-2)
        p = jax.tree.map(jnp.array, {"vae": params,
                                     "decoder": variables["params"]})
        return TrainState.create(p, tx,
                                 batch_stats=jax.tree.map(
                                     jnp.array,
                                     variables.get("batch_stats")))

    steps = make_full_steps(model, decoder, LossConfig(use_focal_loss=True),
                            use_simplified=True, force_xla_kernels=True)
    return fresh_state, steps


def test_spatial_train_step_matches_single_device(rng):
    """One train_full step with pixels height-sharded over ('model',) must
    produce the same loss and parameter update as the unsharded step (the
    wiring behind train_full --spatial_parallel)."""
    from vae_tagger_tpu.parallel.mesh import replicate, shard_batch_spatial

    fresh_state, (train_step, _) = _tiny_full_state_and_steps()
    batch = {
        "anchor": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
        "positive": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
        "negative": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
        "labels": rng.random((2, 5)).astype(np.float32),
        "positive_labels": rng.random((2, 5)).astype(np.float32),
    }
    key = jax.random.key(7)

    ref_state, ref_metrics = train_step(fresh_state(), batch, key)

    mesh = make_mesh(("model",))
    sp_state = replicate(fresh_state(), mesh)
    sp_batch = shard_batch_spatial(batch, mesh)
    sp_state, sp_metrics = train_step(sp_state, sp_batch, key)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    ref_leaves = jax.tree.leaves(jax.device_get(ref_state.params))
    sp_leaves = jax.tree.leaves(jax.device_get(sp_state.params))
    for a, b in zip(ref_leaves, sp_leaves):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)


def test_spatial_batch_rejects_indivisible_height(rng):
    from vae_tagger_tpu.parallel.mesh import shard_batch_spatial

    mesh = make_mesh(("model",))
    batch = {"anchor": rng.integers(0, 256, (2, 36, 36, 3), dtype=np.uint8)}
    with pytest.raises(ValueError, match="divisible"):
        shard_batch_spatial(batch, mesh)


# ---- shard_map flash attention under spatial parallelism (round 4) --------
# GSPMD cannot partition the Pallas flash kernel; the spatial trace instead
# routes the mid-block attention to a shard_map form: all-gather K/V across
# the spatial axis, run the kernel on LOCAL q rows (rectangular).  On the
# CPU mesh the kernel itself cannot run, so these tests force the shard_map
# route (inner XLA) to pin the collective structure and its gradients, and
# separately assert the kernel-dispatch decision with a recording stub.


def test_spatial_sharded_attention_matches_xla(monkeypatch, rng):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_tagger_tpu.ops import attention

    mesh = make_mesh(("model",))
    q = rng.normal(size=(2, 64, 16)).astype(np.float32)
    k = rng.normal(size=(2, 64, 16)).astype(np.float32)
    v = rng.normal(size=(2, 64, 16)).astype(np.float32)
    ref = np.asarray(attention._xla_attention(*map(jnp.asarray, (q, k, v))))

    monkeypatch.setattr(attention, "_FORCE_SPATIAL_SHARD_MAP", True)
    spec = NamedSharding(mesh, P(None, "model"))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
    with attention.spatial_attention_trace(mesh):
        out = jax.jit(attention.spatial_single_head_attention)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_spatial_sharded_attention_gradients(monkeypatch, rng):
    """Gradients flow through shard_map + all_gather identically to the
    unsharded attention (the training-path requirement)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_tagger_tpu.ops import attention

    mesh = make_mesh(("model",))
    q = rng.normal(size=(1, 64, 16)).astype(np.float32)
    k = rng.normal(size=(1, 64, 16)).astype(np.float32)
    v = rng.normal(size=(1, 64, 16)).astype(np.float32)

    def loss_ref(q, k, v):
        return jnp.sum(attention._xla_attention(q, k, v) ** 2)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(
        *map(jnp.asarray, (q, k, v)))

    monkeypatch.setattr(attention, "_FORCE_SPATIAL_SHARD_MAP", True)
    spec = NamedSharding(mesh, P(None, "model"))
    qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))

    def loss_sp(q, k, v):
        return jnp.sum(attention.spatial_single_head_attention(q, k, v) ** 2)

    with attention.spatial_attention_trace(mesh):
        sp_grads = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(qs, ks, vs)
    for got, want in zip(sp_grads, ref_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_spatial_flash_dispatch_decision(monkeypatch, rng):
    """The flash kernel engages iff the LOCAL sequence (S / model-shards)
    clears the measured crossover; the kernel sees local q rows against
    all-gathered global K/V."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    import vae_tagger_tpu.ops.pallas.flash_attention as fa_mod
    from vae_tagger_tpu.ops import attention

    calls = []

    def fake_flash(q, k, v):
        calls.append((q.shape, k.shape))
        return attention._xla_attention(q, k, v)

    monkeypatch.setattr(fa_mod, "flash_attention", fake_flash)
    # pretend the kernel is available (CPU test host) and lower the
    # crossover so a 64-token grid is "long"
    monkeypatch.setattr(attention.backend, "use_pallas",
                        lambda op=None: True)
    monkeypatch.setattr(attention, "_FLASH_MIN_SEQ", 8)
    monkeypatch.setattr(attention, "_FLASH_MIN_SEQ_TRAIN", 8)

    mesh = make_mesh(("model",))
    q = rng.normal(size=(2, 64, 16)).astype(np.float32)
    spec = NamedSharding(mesh, P(None, "model"))
    qs = jax.device_put(q, spec)
    ref = np.asarray(attention._xla_attention(*map(jnp.asarray,
                                                   (q, q, q))))
    # the dispatch decision is made at TRACE time; earlier tests jit this
    # same function at these exact shapes/shardings, and a compiled-cache
    # hit would skip tracing entirely — force a fresh trace
    jax.clear_caches()
    with attention.spatial_attention_trace(mesh):
        out = jax.jit(attention.spatial_single_head_attention)(qs, qs, qs)
    assert calls, "flash kernel was not dispatched"
    q_shape, k_shape = calls[0]
    assert q_shape == (2, 64 // 8, 16)  # local q rows
    assert k_shape == (2, 64, 16)       # all-gathered global K/V
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    # below the crossover the spatial trace stays on the GSPMD XLA path
    calls.clear()
    monkeypatch.setattr(attention, "_FLASH_MIN_SEQ", 4608)
    monkeypatch.setattr(attention, "_FLASH_MIN_SEQ_TRAIN", 4096)
    jax.clear_caches()
    with attention.spatial_attention_trace(mesh):
        out2 = jax.jit(attention.spatial_single_head_attention)(qs, qs, qs)
    assert not calls
    np.testing.assert_allclose(np.asarray(out2), ref, rtol=1e-5, atol=1e-5)


def test_spatial_train_step_with_shard_map_attention(monkeypatch, rng):
    """The full spatial train_full step with the shard_map attention route
    forced must reproduce the single-device step exactly (loss + params) —
    the parity gate for train_full --spatial_parallel once the local
    sequence clears the kernel crossover on real hardware."""
    from vae_tagger_tpu.ops import attention
    from vae_tagger_tpu.parallel.mesh import replicate, shard_batch_spatial

    fresh_state, (train_step, _) = _tiny_full_state_and_steps()
    batch = {
        "anchor": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
        "positive": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
        "negative": rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8),
        "labels": rng.random((2, 5)).astype(np.float32),
        "positive_labels": rng.random((2, 5)).astype(np.float32),
    }
    key = jax.random.key(7)
    ref_state, ref_metrics = train_step(fresh_state(), batch, key)

    monkeypatch.setattr(attention, "_FORCE_SPATIAL_SHARD_MAP", True)
    mesh = make_mesh(("model",))
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.train.steps import make_full_steps

    model = AutoencoderKL(CFG)
    decoder = build_decoder(5, use_attention=True, latent_channels=16)
    sp_step, _ = make_full_steps(model, decoder,
                                 LossConfig(use_focal_loss=True),
                                 use_simplified=True,
                                 force_xla_kernels=True, spatial_mesh=mesh)
    sp_state = replicate(fresh_state(), mesh)
    sp_batch = shard_batch_spatial(batch, mesh)
    sp_state, sp_metrics = sp_step(sp_state, sp_batch, key)

    np.testing.assert_allclose(float(sp_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(jax.device_get(ref_state.params)),
                    jax.tree.leaves(jax.device_get(sp_state.params))):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6)
