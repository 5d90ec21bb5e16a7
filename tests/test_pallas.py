"""Pallas kernel numerics (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vae_tagger_tpu.ops.attention import _xla_attention
from vae_tagger_tpu.ops.pallas.flash_attention import (
    _flash_attention_fwd_impl,
    flash_attention,
)


@pytest.mark.parametrize("s", [256, 640])  # 640: not a block multiple -> pad
def test_flash_attention_matches_xla(s):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, s, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, s, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, s, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, lse = _flash_attention_fwd_impl(q, k, v, block_q=256,
                                             block_k=256)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    # lse must equal the logsumexp of the scaled scores
    scores = np.einsum("bqd,bkd->bqk", q, k) / np.sqrt(q.shape[-1])
    ref_lse = np.log(np.sum(np.exp(scores - scores.max(-1, keepdims=True)),
                            axis=-1)) + scores.max(-1)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=1e-4,
                               atol=1e-4)


def test_flash_attention_gradients_multiblock_padded():
    """Pallas dq/dkv kernels vs autodiff of the reference, with distinct
    q/k/v, multiple blocks, and a non-block-multiple sequence (padding)."""
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, 320, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 320, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 320, 128)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 320, 128)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        _, vjp = jax.vjp(flash_attention, q, k, v)
        dq, dk, dv = vjp(ct)
    _, vjp_ref = jax.vjp(_xla_attention, q, k, v)
    dq_r, dk_r, dv_r = vjp_ref(ct)
    for a, b, name in [(dq, dq_r, "dq"), (dk, dk_r, "dk"), (dv, dv_r, "dv")]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_flash_attention_gradients():
    """End-to-end grad through the custom_vjp matches the reference path."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 128, 128)), jnp.float32)

    def loss_flash(q):
        return jnp.sum(flash_attention(q, q, q) ** 2)

    def loss_ref(q):
        return jnp.sum(_xla_attention(q, q, q) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("apply_silu", [True, False])
def test_groupnorm_silu_kernel_matches_reference(apply_silu):
    from vae_tagger_tpu.ops.normalization import group_norm
    from vae_tagger_tpu.ops.pallas.groupnorm_silu import group_norm_silu_pallas

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 128)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu_pallas(x, scale, bias, num_groups=32,
                                     apply_silu=apply_silu)
    ref = group_norm(x, scale, bias, num_groups=32, eps=1e-6)
    if apply_silu:
        ref = ref * jax.nn.sigmoid(ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_groupnorm_silu_gradients_via_dispatch():
    """The custom-vjp wrapper must match plain autodiff of the reference."""
    from vae_tagger_tpu.ops.normalization import group_norm, group_norm_silu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 16)), jnp.float32)
    scale = jnp.ones((16,))
    bias = jnp.zeros((16,))

    def loss_fused(x, s, b):
        return jnp.sum(group_norm_silu(x, s, b, num_groups=4) ** 2)

    def loss_ref(x, s, b):
        y = group_norm(x, s, b, num_groups=4, eps=1e-6)
        return jnp.sum((y * jax.nn.sigmoid(y)) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_backend_dispatch():
    """On CPU (tests) the XLA path must be selected automatically."""
    from vae_tagger_tpu.ops import backend

    assert jax.default_backend() == "cpu"
    assert not backend.use_pallas()
    with backend.backend("pallas"):
        assert backend.use_pallas()
    with backend.backend("xla"):
        assert not backend.use_pallas()


def test_training_trace_threshold_selection():
    """training_trace() lowers the flash crossover to the measured training
    value for exactly the enclosed trace region, nests, and restores on
    exceptions (probe: benchmarks/probe_512_full.py)."""
    from vae_tagger_tpu.ops import attention

    assert attention._min_flash_seq() == attention._FLASH_MIN_SEQ
    with attention.training_trace():
        assert attention._min_flash_seq() == attention._FLASH_MIN_SEQ_TRAIN
        with attention.training_trace():
            assert (attention._min_flash_seq()
                    == attention._FLASH_MIN_SEQ_TRAIN)
        assert attention._min_flash_seq() == attention._FLASH_MIN_SEQ_TRAIN
    assert attention._min_flash_seq() == attention._FLASH_MIN_SEQ

    with pytest.raises(RuntimeError):
        with attention.training_trace():
            raise RuntimeError("boom")
    assert attention._min_flash_seq() == attention._FLASH_MIN_SEQ


def test_training_trace_dispatch(monkeypatch):
    """S=4096 (the 512px mid-block) routes to the flash kernel only inside a
    training trace; forward/inference tracing keeps the XLA path."""
    import vae_tagger_tpu.ops.pallas.flash_attention as fa
    from vae_tagger_tpu.ops import attention, backend

    calls = []

    def fake_flash(q, k, v):
        calls.append(q.shape[1])
        return attention._xla_attention(q, k, v)

    monkeypatch.setattr(fa, "flash_attention", fake_flash)
    q = jnp.zeros((1, 4096, 4), jnp.float32)
    with backend.backend("pallas"):
        attention.spatial_single_head_attention(q, q, q)
        assert calls == []
        with attention.training_trace():
            attention.spatial_single_head_attention(q, q, q)
        assert calls == [4096]


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_groupnorm_silu_chunked_matches_reference(dtype, tol):
    """Grid-chunked two-phase GN kernel (covers samples too large for VMEM,
    e.g. the 1024px mid/out GN sites) vs the XLA reference."""
    from vae_tagger_tpu.ops.normalization import group_norm
    from vae_tagger_tpu.ops.pallas.groupnorm_silu import (
        group_norm_silu_chunked_pallas,
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 128)), dtype)
    scale = jnp.asarray(rng.normal(size=(128,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = group_norm_silu_chunked_pallas(x, scale, bias, num_groups=32,
                                             tile=64)
    y = group_norm(x, scale, bias, num_groups=32, eps=1e-6)
    ref = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_flash_attention_rectangular_q():
    """q shorter than k/v (the spatially-sharded local-q form): forward
    parity vs the XLA reference and gradients vs autodiff, across blocks
    and with non-block-multiple lengths on BOTH axes."""
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(2, 192, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 448, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 448, 128)), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(2, 192, 128)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out, lse = _flash_attention_fwd_impl(q, k, v, block_q=128,
                                             block_k=256)
        _, vjp = jax.vjp(flash_attention, q, k, v)
        dq, dk, dv = vjp(ct)

    ref_out, ref_vjp = jax.vjp(_xla_attention, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-4)
    scores = np.einsum("bqd,bkd->bqk", q, k) / np.sqrt(q.shape[-1])
    ref_lse = np.log(np.sum(np.exp(scores - scores.max(-1, keepdims=True)),
                            axis=-1)) + scores.max(-1)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=1e-4,
                               atol=1e-4)
    for got, want in zip((dq, dk, dv), ref_vjp(ct)):
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
