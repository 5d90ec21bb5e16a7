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
        out = _flash_attention_fwd_impl(q, k, v, block_q=256, block_k=256)
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_flash_attention_gradients():
    """custom_vjp backward (XLA recompute) must match autodiff through the
    reference path."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 128, 128)), jnp.float32)

    def loss_flash(q):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(flash_attention(q, q, q) ** 2)

    def loss_ref(q):
        return jnp.sum(_xla_attention(q, q, q) ** 2)

    g_flash = jax.grad(loss_flash)(q)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_backend_dispatch():
    """On CPU (tests) the XLA path must be selected automatically."""
    from vae_tagger_tpu.ops import backend

    assert jax.default_backend() == "cpu"
    assert not backend.use_pallas()
    with backend.backend("pallas"):
        assert backend.use_pallas()
    with backend.backend("xla"):
        assert not backend.use_pallas()
