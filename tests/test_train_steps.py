"""Train-step tests: gradients flow, losses decrease, freeze semantics,
adaptive weights, sharding over the virtual mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.losses.combined import AdaptiveLossWeights, LossConfig
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.train.schedule import build_lr_schedule
from vae_tagger_tpu.train.state import TrainState, build_optimizer
from vae_tagger_tpu.train.steps import (
    make_decoder_steps,
    make_full_steps,
    make_vae_steps,
)

TINY = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                               norm_num_groups=4, latent_channels=16,
                               sample_size=32)
NUM_CLASSES = 8
B = 2


@functools.lru_cache(maxsize=None)
def _models():
    vae = AutoencoderKL(TINY)
    decoder = build_decoder(NUM_CLASSES, use_attention=True,
                            latent_channels=16)
    vae_params = jax.jit(vae.init)({"params": jax.random.key(0)},
                                   jnp.zeros((1, 32, 32, 3)),
                                   jax.random.key(1))["params"]
    dec_vars = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 4, 4, 16)),
        deterministic=True)
    return vae, decoder, vae_params, dec_vars


def _fresh(tree):
    """Deep-copy a param tree: train steps donate the state buffers, which
    would invalidate the lru-cached arrays shared across tests."""
    return jax.tree.map(jnp.array, tree)


def _batch(triplets=True, b=B):
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8),
        "labels": (rng.random((b, NUM_CLASSES)) > 0.5).astype(np.float32),
    }
    if triplets:
        for k in ("anchor", "positive", "negative"):
            batch[k] = rng.integers(0, 256, (b, 32, 32, 3), dtype=np.uint8)
        batch["positive_labels"] = batch["labels"]
    return {k: jnp.asarray(v) for k, v in batch.items()}


def test_decoder_step_trains_and_freezes_vae():
    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-3), 1e-6, 1.0, 1)
    state = TrainState.create(_fresh(dec_vars["params"]), tx,
                              batch_stats=_fresh(dec_vars.get("batch_stats")))
    train_step, eval_step = make_decoder_steps(vae, decoder, cfg)
    batch = _batch(triplets=False)

    vae_before = jax.tree.map(np.asarray, vae_params)
    losses = []
    for i in range(4):
        state, metrics = train_step(state, vae_params, batch,
                                    jax.random.key(i))
        losses.append(float(metrics["loss"]))
    # same batch, loss should drop
    assert losses[-1] < losses[0], losses
    # vae params untouched (frozen by construction)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 vae_before, vae_params)
    # batch stats actually update during training
    out = eval_step(state, vae_params, batch)
    assert out["probs"].shape == (B, NUM_CLASSES)


def test_vae_step_trains():
    vae, _, vae_params, _ = _models()
    cfg = LossConfig(reconstruction_weight=1.0, triplet_weight=0.1)
    tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)
    state = TrainState.create(_fresh(vae_params), tx)
    train_step, eval_step = make_vae_steps(vae, cfg, use_simplified=True)
    batch = _batch()
    losses = []
    for i in range(4):
        state, metrics = train_step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert float(metrics["kl_loss"]) >= 0  # monitored even in simplified mode


@pytest.mark.parametrize("use_simplified", [True, False])
def test_full_step_modes(use_simplified):
    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)
    params = {"vae": _fresh(vae_params), "decoder": _fresh(dec_vars["params"])}
    state = TrainState.create(params, tx,
                              batch_stats=_fresh(dec_vars.get("batch_stats")))
    train_step, eval_step = make_full_steps(vae, decoder, cfg,
                                            use_simplified=use_simplified)
    batch = _batch()
    state, metrics = train_step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    expected = ({"triplet_loss", "classification_loss", "loss"}
                if use_simplified else
                {"reconstruction_loss", "kl_loss", "triplet_loss",
                 "classification_loss", "loss"})
    assert expected <= set(metrics)
    # vae params DID change (not frozen in train_full)
    changed = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params["vae"], vae_params)
    assert max(jax.tree.leaves(changed)) > 0


def test_full_step_adaptive_weights_trained():
    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True, use_adaptive_weights=True)
    adaptive = AdaptiveLossWeights(num_losses=4)
    adaptive_params = adaptive.init(jax.random.key(0),
                                    [0.0, 0.0, 0.0, 0.0])["params"]
    tx = build_optimizer(optax.constant_schedule(1e-2), 0.0, 1.0, 1)
    params = {"vae": _fresh(vae_params), "decoder": _fresh(dec_vars["params"]),
              "adaptive": adaptive_params}
    state = TrainState.create(params, tx,
                              batch_stats=_fresh(dec_vars.get("batch_stats")))
    train_step, _ = make_full_steps(vae, decoder, cfg, use_simplified=False,
                                    adaptive_module=adaptive)
    batch = _batch()
    before = np.asarray(params["adaptive"]["log_weights"])
    for i in range(2):
        state, metrics = train_step(state, batch, jax.random.key(i))
    after = np.asarray(state.params["adaptive"]["log_weights"])
    assert not np.allclose(before, after), "adaptive weights must train"
    assert "adaptive_weights" in metrics


def test_gradient_accumulation_matches_larger_batch_direction():
    """MultiSteps: params unchanged until k micro-batches consumed."""
    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-3), 0.0, 0.0, 2)
    state = TrainState.create(_fresh(dec_vars["params"]), tx,
                              batch_stats=_fresh(dec_vars.get("batch_stats")))
    train_step, _ = make_decoder_steps(vae, decoder, cfg)
    batch = _batch(triplets=False)
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = train_step(state, vae_params, batch, jax.random.key(0))
    # after 1 of 2 micro-steps params must be unchanged
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                 p0, state.params)
    state, _ = train_step(state, vae_params, batch, jax.random.key(1))
    diffs = jax.tree.map(lambda a, b: float(np.max(np.abs(a - np.asarray(b)))),
                         p0, state.params)
    assert max(jax.tree.leaves(diffs)) > 0


def test_schedule_shapes():
    s = build_lr_schedule("cosine", 1e-3, 10, 100)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(10)), 1e-3, rtol=1e-5)
    assert float(s(100)) < 1e-4  # decayed
    s = build_lr_schedule("constant_with_warmup", 1e-3, 10, 100)
    np.testing.assert_allclose(float(s(50)), 1e-3, rtol=1e-5)
    s = build_lr_schedule("linear", 1e-3, 0, 100)
    np.testing.assert_allclose(float(s(50)), 5e-4, rtol=1e-2)


def test_data_parallel_sharded_step():
    """Full train step over all 8 virtual devices with a sharded batch must
    produce the same loss as the single-device run."""
    from vae_tagger_tpu.parallel.mesh import (
        make_mesh,
        replicate,
        shard_batch,
    )

    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)
    params = {"vae": _fresh(vae_params), "decoder": _fresh(dec_vars["params"])}
    state = TrainState.create(params, tx,
                              batch_stats=_fresh(dec_vars.get("batch_stats")))
    train_step, _ = make_full_steps(vae, decoder, cfg, use_simplified=True)

    batch = _batch(b=8)
    # single-device result (train_step donates its state; keep a copy for
    # the sharded run)
    state_copy = jax.tree.map(jnp.array, state)
    state1, m1 = train_step(state, batch, jax.random.key(0))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state_r = replicate(state_copy, mesh)
    batch_s = shard_batch(batch, mesh)
    state8, m8 = train_step(state_r, batch_s, jax.random.key(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)
    # Params agree within one Adam step (2*lr): fp reduction order differs
    # between 1- and 8-device execution, and Adam's first update is
    # lr*sign(g), so params with near-zero gradients may take opposite-sign
    # steps.  Loss equality above establishes forward parity; here we bound
    # the divergence to the update size.
    lr = 1e-4
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2.5 * lr),
        jax.device_get(state1.params), jax.device_get(state8.params))


def test_checkpoint_encode_matches():
    """checkpoint_encode=True must give the same loss and (up to fp noise)
    gradients as the 3B-concat path."""
    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 0.0, 0.0, 1)
    batch = _batch()

    results = []
    for ck in (False, True):
        params = {"vae": _fresh(vae_params),
                  "decoder": _fresh(dec_vars["params"])}
        state = TrainState.create(params, tx,
                                  batch_stats=_fresh(dec_vars.get("batch_stats")))
        train_step, _ = make_full_steps(vae, decoder, cfg,
                                        use_simplified=True,
                                        checkpoint_encode=ck)
        state, metrics = train_step(state, batch, jax.random.key(0))
        results.append((float(metrics["loss"]),
                        jax.device_get(state.params)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4),
        results[0][1], results[1][1])


def test_stacked_checkpoint_encode_padded_matches(monkeypatch):
    """The round-3 adaptive stacked triplet encode, in its TPU form (3B=6
    rows sublane-padded to 8 under one jax.checkpoint), must match the
    plain checkpoint path's loss and gradients: pad rows are zeros, sliced
    off before sampling, and GroupNorm is per-sample so they cannot leak."""
    from vae_tagger_tpu.ops import backend as kernel_backend

    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 0.0, 0.0, 1)
    batch = _batch()  # b=2 -> 6 rows, stacked branch pads to 8 on "tpu"

    def run():
        params = {"vae": _fresh(vae_params),
                  "decoder": _fresh(dec_vars["params"])}
        state = TrainState.create(
            params, tx, batch_stats=_fresh(dec_vars.get("batch_stats")))
        train_step, _ = make_full_steps(vae, decoder, cfg,
                                        use_simplified=True,
                                        checkpoint_encode=True)
        state, metrics = train_step(state, batch, jax.random.key(0))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_plain, params_plain = run()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with kernel_backend.backend("xla"):
        loss_padded, params_padded = run()
    np.testing.assert_allclose(loss_plain, loss_padded, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4),
        params_plain, params_padded)


def test_bs1_per_member_encode_matches_stacked(monkeypatch):
    """On TPU the bs1 non-checkpoint triplet encode runs three per-member
    N=1 encodes (the stacked 3-row encode measured pathologically slow on
    v5e, benchmarks/slab_probe.py) — results must be identical to the
    plain stacked path since GroupNorm/conv are per-sample."""
    from vae_tagger_tpu.ops import backend as kernel_backend

    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 0.0, 0.0, 1)
    batch = _batch(b=1)  # 3 rows; pad gate blocks 3->8, bs1 branch engages

    def run():
        params = {"vae": _fresh(vae_params),
                  "decoder": _fresh(dec_vars["params"])}
        state = TrainState.create(
            params, tx, batch_stats=_fresh(dec_vars.get("batch_stats")))
        train_step, _ = make_full_steps(vae, decoder, cfg,
                                        use_simplified=True,
                                        checkpoint_encode=False)
        state, metrics = train_step(state, batch, jax.random.key(0))
        return float(metrics["loss"]), jax.device_get(state.params)

    loss_stacked, params_stacked = run()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    with kernel_backend.backend("xla"):
        loss_member, params_member = run()
    np.testing.assert_allclose(loss_stacked, loss_member, rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4),
        params_stacked, params_member)


def test_stacked_checkpoint_encode_respects_px_limit(monkeypatch):
    """Above stack_px_limit() the checkpointed encode must fall back to
    per-member encodes (the memory bound that keeps 1024px bs1 in HBM) and
    still produce the same loss."""
    from vae_tagger_tpu.train import steps as steps_mod

    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 0.0, 0.0, 1)
    batch = _batch()

    def run():
        params = {"vae": _fresh(vae_params),
                  "decoder": _fresh(dec_vars["params"])}
        state = TrainState.create(
            params, tx, batch_stats=_fresh(dec_vars.get("batch_stats")))
        train_step, _ = make_full_steps(vae, decoder, cfg,
                                        use_simplified=True,
                                        checkpoint_encode=True)
        state, metrics = train_step(state, batch, jax.random.key(0))
        return float(metrics["loss"])

    loss_stacked = run()
    monkeypatch.setattr(steps_mod, "_CACHED_PX_LIMIT", 0)
    loss_member = run()
    np.testing.assert_allclose(loss_stacked, loss_member, rtol=1e-5)


def test_stack_px_limit_scales_with_device_hbm(monkeypatch):
    """The stacking budget is computed from the device's reported HBM:
    the 16 GB v5e reproduces the measured 7.2M-px limit exactly, larger
    parts scale linearly, and backends that report nothing (CPU tests)
    fall back to the measured v5e value."""
    from vae_tagger_tpu.core import runtime
    from vae_tagger_tpu.train import steps as steps_mod

    monkeypatch.setattr(steps_mod, "_CACHED_PX_LIMIT", None)
    monkeypatch.setenv("VAE_TAGGER_HBM_BYTES", str(runtime.V5E_HBM_BYTES))
    assert steps_mod.stack_px_limit() == steps_mod._V5E_STACK_PX_LIMIT

    monkeypatch.setattr(steps_mod, "_CACHED_PX_LIMIT", None)
    monkeypatch.setenv("VAE_TAGGER_HBM_BYTES",
                       str(6 * runtime.V5E_HBM_BYTES))
    assert steps_mod.stack_px_limit() == 6 * steps_mod._V5E_STACK_PX_LIMIT

    # CPU backend: device_hbm_bytes() is None -> measured v5e fallback
    monkeypatch.setattr(steps_mod, "_CACHED_PX_LIMIT", None)
    monkeypatch.delenv("VAE_TAGGER_HBM_BYTES", raising=False)
    assert runtime.device_hbm_bytes() is None
    assert steps_mod.stack_px_limit() == steps_mod._V5E_STACK_PX_LIMIT


def test_training_determinism():
    """Same seed + same data -> identical loss sequence (replaces the
    reference's cudnn_deterministic story: jit compilation is deterministic
    and all randomness flows through explicit keys)."""
    vae, decoder, vae_params, dec_vars = _models()
    cfg = LossConfig(use_focal_loss=True)
    batch = _batch()

    def run():
        tx = build_optimizer(optax.constant_schedule(1e-3), 1e-6, 1.0, 1)
        params = {"vae": _fresh(vae_params),
                  "decoder": _fresh(dec_vars["params"])}
        state = TrainState.create(params, tx,
                                  batch_stats=_fresh(dec_vars.get("batch_stats")))
        train_step, _ = make_full_steps(vae, decoder, cfg,
                                        use_simplified=True)
        losses = []
        for i in range(3):
            state, metrics = train_step(state, batch, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        return losses

    np.testing.assert_array_equal(run(), run())


def test_triplet_sublane_padding_is_loss_neutral(monkeypatch):
    """The in-step 3B->8k sublane padding (steps.py::_triplet_posterior)
    must not change the eval loss: padded zero rows are sliced off before
    any loss term.  Forced on by faking a TPU backend (the pad math itself
    runs fine on CPU)."""
    vae, decoder, vae_params, _ = _models()
    cfg = LossConfig(reconstruction_weight=1.0, triplet_weight=0.1)
    batch = _batch(b=2)  # 3B = 6 rows -> pads to 8 when "on TPU"
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)

    _, eval_plain = make_vae_steps(vae, cfg, use_simplified=True)
    m_plain = eval_plain(TrainState.create(_fresh(vae_params), tx), batch,
                         jax.random.key(0))

    from vae_tagger_tpu.ops import backend as kernel_backend

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # fresh step builder -> fresh jit cache entry tracing the padded branch;
    # kernel dispatch pinned to XLA (the fake "tpu" backend would otherwise
    # route GroupNorm to Pallas kernels on the CPU test host)
    with kernel_backend.backend("xla"):
        _, eval_padded = make_vae_steps(vae, cfg, use_simplified=True)
        m_padded = eval_padded(TrainState.create(_fresh(vae_params), tx),
                               batch, jax.random.key(0))

    for k in m_plain:
        np.testing.assert_allclose(np.asarray(m_plain[k]),
                                   np.asarray(m_padded[k]),
                                   rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("builder", ["vae", "full"])
def test_recon_draw_independent_of_triplet_draw(builder, monkeypatch):
    """The reconstruction term must decode its OWN posterior draw, separate
    from the triplet draw (the reference's structure: train_vae.py:131-146,
    train_full.py:209-213).  Sharing one draw measurably destabilizes
    training — the posterior drifts from the prior (log-damped KL 12 vs 0.6
    by epoch 2) and the held-out objective rises
    (benchmarks/vae_dynamics_probe.py); this pins the two-draw structure at
    trace time."""
    import vae_tagger_tpu.models.autoencoder_kl as ak
    import vae_tagger_tpu.train.steps as steps_mod

    vae, decoder, vae_params, dec_vars = _models()
    calls = []
    orig = ak.DiagonalGaussian.sample

    def counting_sample(self, rng):
        calls.append(self.mean.shape)
        return orig(self, rng)

    monkeypatch.setattr(ak.DiagonalGaussian, "sample", counting_sample)
    # steps.py binds the class at import; patch both namespaces
    monkeypatch.setattr(steps_mod.DiagonalGaussian, "sample",
                        counting_sample, raising=False)

    cfg = LossConfig(use_focal_loss=True)
    tx = build_optimizer(optax.constant_schedule(1e-4), 1e-6, 1.0, 1)
    if builder == "vae":
        state = TrainState.create(_fresh(vae_params), tx)
        train_step, _ = make_vae_steps(vae, cfg, use_simplified=True)
    else:
        state = TrainState.create(
            {"vae": _fresh(vae_params), "decoder": _fresh(
                dec_vars["params"])}, tx,
            batch_stats=_fresh(dec_vars.get("batch_stats")))
        train_step, _ = make_full_steps(vae, decoder, cfg,
                                        use_simplified=False)
    jax.clear_caches()  # force a fresh trace so the counter records
    train_step(state, _batch(), jax.random.key(0))
    # one (3B,...) triplet draw + one (B,...) anchor-only recon draw
    shapes = sorted(calls, key=lambda s: s[0])
    assert len(shapes) == 2, f"expected 2 posterior draws, saw {calls}"
    assert shapes[0][0] == B and shapes[1][0] == 3 * B, calls
