"""Parity tests for the fused GN+SiLU+Conv3x3 Pallas kernel (interpret mode).

The kernel (ops/pallas/conv_fused.py) must match the XLA reference
(GroupNorm -> SiLU -> lax.conv [+ residual/shortcut]) that ops/conv.py uses
as its fallback and backward path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vae_tagger_tpu.ops.conv import (
    _make_fused,
    effective_affine,
    gn_silu_conv3x3,
    group_stats,
)
from vae_tagger_tpu.ops.pallas.conv_fused import (
    gn_silu_conv3x3_pallas,
    plan_fused_conv,
)

GROUPS = 32


def _setup(rng, n, h, w, c_in, c_out, c_res=None):
    x = jnp.asarray(rng.normal(size=(n, h, w, c_in)), jnp.float32)
    gs = jnp.asarray(rng.normal(size=(c_in,)) * 0.2 + 1.0, jnp.float32)
    gb = jnp.asarray(rng.normal(size=(c_in,)) * 0.1, jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, c_in, c_out)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.normal(size=(c_out,)) * 0.1, jnp.float32)
    res = None
    if c_res is not None:
        res = jnp.asarray(rng.normal(size=(n, h, w, c_res)), jnp.float32)
    return x, gs, gb, k, b, res


def _run_pallas(x, gs, gb, k, b, res=None, sck=None, scb=None, th=4, tc=128):
    mean, meansq = group_stats(x, GROUPS)
    es, eb = effective_affine(mean, meansq, gs, gb, x.shape[-1], 1e-6)
    with pltpu.force_tpu_interpret_mode():
        return gn_silu_conv3x3_pallas(x, es, eb, k, b, res, sck, scb,
                                      tile_h=th, tile_cout=tc,
                                      interpret=True)


def test_fused_conv_matches_reference_plain(rng):
    x, gs, gb, k, b, _ = _setup(rng, 2, 8, 16, 128, 128)
    ref = _make_fused(GROUPS, 1e-6, False, False).reference(x, gs, gb, k, b)
    out = _run_pallas(x, gs, gb, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_conv_matches_reference_residual(rng):
    x, gs, gb, k, b, res = _setup(rng, 1, 8, 8, 128, 128, c_res=128)
    ref = _make_fused(GROUPS, 1e-6, True, False).reference(
        x, gs, gb, k, b, res)
    out = _run_pallas(x, gs, gb, k, b, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_conv_matches_reference_shortcut_multitile(rng):
    """128 -> 256 channels with 1x1 shortcut, 2 Cout tiles, 2 H tiles."""
    x, gs, gb, k, b, res = _setup(rng, 1, 8, 8, 128, 256, c_res=128)
    sck = jnp.asarray(rng.normal(size=(1, 1, 128, 256)) * 0.1, jnp.float32)
    scb = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    ref = _make_fused(GROUPS, 1e-6, False, True).reference(
        x, gs, gb, k, b, res, sck, scb)
    out = _run_pallas(x, gs, gb, k, b, res, sck, scb, th=4, tc=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_conv_bf16(rng):
    x, gs, gb, k, b, _ = _setup(rng, 1, 8, 16, 128, 128)
    xb = x.astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    ref = _make_fused(GROUPS, 1e-6, False, False).reference(xb, gs, gb, kb, b)
    out = _run_pallas(xb, gs, gb, kb, b)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_dispatcher_gradients_match_reference(rng):
    """custom_vjp backward == autodiff through the reference."""
    x, gs, gb, k, b, res = _setup(rng, 1, 4, 8, 128, 128, c_res=128)

    def loss_fused(x, gs, gb, k, b, res):
        return jnp.sum(gn_silu_conv3x3(x, gs, gb, k, b, res,
                                       num_groups=GROUPS) ** 2)

    ref_fn = _make_fused(GROUPS, 1e-6, True, False).reference

    def loss_ref(x, gs, gb, k, b, res):
        return jnp.sum(ref_fn(x, gs, gb, k, b, res) ** 2)

    grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        x, gs, gb, k, b, res)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        x, gs, gb, k, b, res)
    for g, gr in zip(grads, grads_ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                                   rtol=1e-5, atol=1e-5)


def test_plan_covers_1024px_stages():
    """Every encoder/decoder resnet GN site at 1024px must get a plan
    (VERDICT round-1 item 3: no XLA fallback at the largest-traffic
    stages)."""
    stages = [
        (1024, 1024, 128, 128, 128),  # encoder stage 0 (and decoder out)
        (512, 512, 128, 256, 128),    # stage 1 first resnet (shortcut)
        (512, 512, 256, 256, 256),
        (256, 256, 256, 512, 256),    # stage 2 first resnet (shortcut)
        (256, 256, 512, 512, 512),
        (128, 128, 512, 512, 512),    # stage 3 + mid block
    ]
    for h, w, c_in, c_out, c_res in stages:
        for itemsize in (2, 4):
            assert plan_fused_conv(h, w, c_in, c_out, c_res, itemsize), (
                h, w, c_in, c_out, itemsize)
        assert plan_fused_conv(h, w, c_in, c_out, None, 2)


@pytest.mark.parametrize("out_ch", [128, 256])  # 256 exercises the shortcut
def test_resnet_block_fused_path_matches_unfused(rng, out_ch):
    """Full ResnetBlock through the fused Pallas path (interpret mode)
    vs the plain XLA path, same params."""
    from vae_tagger_tpu.nn.blocks import ResnetBlock
    from vae_tagger_tpu.ops import backend

    block = ResnetBlock(out_channels=out_ch, num_groups=32)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 128)), jnp.float32)
    params = jax.jit(block.init)(jax.random.key(0), x)
    ref = jax.jit(block.apply)(params, x)
    with backend.backend("pallas"), pltpu.force_tpu_interpret_mode():
        fused = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_plan_rejects_latent_side_convs():
    assert plan_fused_conv(128, 128, 512, 32, None, 2) is None   # conv_out
    assert plan_fused_conv(128, 128, 16, 512, None, 2) is None   # conv_in dec


def test_nchw_island_matches_nhwc():
    """The NCHW-island layout experiment (ops/conv.py::nchw_island_trace)
    is math-identical to the NHWC conv: same outputs for eligible 3x3
    convs, strided/1x1/large-channel convs untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_tagger_tpu.ops.conv import conv_nhwc, nchw_island_trace

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 8)), jnp.float32)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 8, 12)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(1, 1, 8, 12)), jnp.float32)

    base3 = conv_nhwc(x, k3)
    base3s = conv_nhwc(x, k3, strides=(2, 2), padding=((0, 1), (0, 1)))
    base1 = conv_nhwc(x, k1)
    with nchw_island_trace(8):
        np.testing.assert_allclose(np.asarray(conv_nhwc(x, k3)),
                                   np.asarray(base3), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(conv_nhwc(x, k3, strides=(2, 2),
                                 padding=((0, 1), (0, 1)))),
            np.asarray(base3s), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(conv_nhwc(x, k1)),
                                   np.asarray(base1), rtol=1e-6, atol=1e-6)
    with nchw_island_trace(4):  # channels above the cap stay NHWC
        out = conv_nhwc(x, k3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base3),
                               rtol=1e-6, atol=1e-6)

    # gradients flow through the island identically
    def loss_fn(x, use_island):
        import contextlib

        ctx = nchw_island_trace(8) if use_island else contextlib.nullcontext()
        with ctx:
            return jnp.sum(conv_nhwc(x, k3) ** 2)

    g_base = jax.grad(lambda x: loss_fn(x, False))(x)
    g_isl = jax.grad(lambda x: loss_fn(x, True))(x)
    np.testing.assert_allclose(np.asarray(g_isl), np.asarray(g_base),
                               rtol=1e-5, atol=1e-5)
