"""Parity tests for the H-folded slab convolution (ops/conv.py).

Slab mode recovers full sublane rows for tiny-batch convs by folding image
height into the batch dimension with explicit halo rows; the math must be
IDENTICAL to the image-layout conv — these tests assert that op-level
(both stride cases), model-level (full encoder under slab_trace), and
through the gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_tagger_tpu.ops.conv import (
    conv2d_slabbed,
    current_slabs,
    slab_eligible,
    slab_trace,
)


def _ref_conv(x, kernel, bias, strides, padding):
    out = jax.lax.conv_general_dilated(
        x, kernel, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


@pytest.mark.parametrize("method", ["fixup", "halo"])
@pytest.mark.parametrize("b,h,w,cin,cout,slabs", [
    (1, 64, 48, 8, 16, 8),
    (3, 32, 32, 4, 4, 4),
    (2, 64, 16, 8, 8, 2),
])
def test_slab_conv3x3_stride1_parity(b, h, w, cin, cout, slabs, method):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(k1, (b, h, w, cin), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (cout,), jnp.float32)
    ref = _ref_conv(x, kernel, bias, (1, 1), "SAME")
    out = conv2d_slabbed(x, kernel, bias, strides=(1, 1), n_slabs=slabs,
                         method=method)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("method", ["fixup", "halo"])
@pytest.mark.parametrize("b,h,w,cin,cout,slabs", [
    (1, 64, 48, 8, 16, 4),
    (3, 32, 32, 4, 8, 2),
])
def test_slab_conv3x3_stride2_parity(b, h, w, cin, cout, slabs, method):
    """The diffusers downsample: stride 2, asymmetric (0,1),(0,1) padding."""
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(k1, (b, h, w, cin), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, cin, cout), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (cout,), jnp.float32)
    ref = _ref_conv(x, kernel, bias, (2, 2), ((0, 1), (0, 1)))
    out = conv2d_slabbed(x, kernel, bias, strides=(2, 2), n_slabs=slabs,
                         method=method)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-5)


def test_slab_conv_gradient_parity():
    """Halo gathers are slices/concats: autodiff must scatter gradients back
    to the right rows — compare full jacobian-vector products."""
    k1, k2 = jax.random.split(jax.random.key(2))
    x = jax.random.normal(k1, (1, 32, 16, 4), jnp.float32)
    kernel = jax.random.normal(k2, (3, 3, 4, 4), jnp.float32) * 0.1
    bias = jnp.zeros((4,))

    def loss_ref(x, k):
        return jnp.sum(jnp.sin(_ref_conv(x, k, bias, (1, 1), "SAME")))

    def loss_slab(x, k):
        return jnp.sum(jnp.sin(conv2d_slabbed(x, k, bias, strides=(1, 1),
                                              n_slabs=4)))

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
    gx_s, gk_s = jax.grad(loss_slab, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk_s), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-5)


def test_slab_eligibility_rules():
    with slab_trace(8):
        assert current_slabs() == 8
        # eligible: tiny batch, H folds into >=8-row slabs
        assert slab_eligible((1, 64, 64, 8), (3, 3, 8, 8), (1, 1), "SAME")
        # full-sublane batches are left alone (folding only adds halos)
        assert not slab_eligible((8, 64, 64, 8), (3, 3, 8, 8), (1, 1), "SAME")
        # 1x1 convs are batch-agnostic matmuls: never slabbed
        assert not slab_eligible((1, 64, 64, 8), (1, 1, 8, 8), (1, 1), "SAME")
        # H must divide into >=8-row slabs
        assert not slab_eligible((1, 32, 64, 8), (3, 3, 8, 8), (1, 1), "SAME")
        assert not slab_eligible((1, 60, 64, 8), (3, 3, 8, 8), (1, 1), "SAME")
        # stride-2 requires the diffusers asymmetric padding + even slabs
        assert slab_eligible((1, 64, 64, 8), (3, 3, 8, 8), (2, 2),
                             ((0, 1), (0, 1)))
        assert not slab_eligible((1, 64, 64, 8), (3, 3, 8, 8), (2, 2), "SAME")
    assert current_slabs() == 0
    assert not slab_eligible((1, 64, 64, 8), (3, 3, 8, 8), (1, 1), "SAME")


def test_encoder_slab_trace_parity():
    """Full VAE encode traced under slab_trace(4) matches the plain trace
    (the dispatch sits inside Conv2D; GN/attention are untouched)."""
    from vae_tagger_tpu.core.config import VAEConfig
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), latent_channels=4,
                    norm_num_groups=4, layers_per_block=2)
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.key(3), (1, 64, 64, 3), jnp.float32)
    params = vae.init({"params": jax.random.key(4)}, x, jax.random.key(5))

    def encode(params, x):
        post = vae.apply(params, x, method=AutoencoderKL.encode)
        return post.mean, post.logvar

    m_ref, lv_ref = jax.jit(encode)(params, x)
    with slab_trace(4):
        m_slab, lv_slab = jax.jit(encode)(params, x)
    np.testing.assert_allclose(np.asarray(m_slab), np.asarray(m_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lv_slab), np.asarray(lv_ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_slab_trace_parity():
    """Decode (up-stack: upsample convs + resnets) under slab_trace."""
    from vae_tagger_tpu.core.config import VAEConfig
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), latent_channels=4,
                    norm_num_groups=4, layers_per_block=2)
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.key(6), (1, 64, 64, 3), jnp.float32)
    params = vae.init({"params": jax.random.key(7)}, x, jax.random.key(8))
    z = jax.random.normal(jax.random.key(9), (1, 8, 8, 4), jnp.float32)

    decode = lambda p, z: vae.apply(p, z, method=AutoencoderKL.decode)
    ref = jax.jit(decode)(params, z)
    with slab_trace(4):
        out = jax.jit(decode)(params, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
