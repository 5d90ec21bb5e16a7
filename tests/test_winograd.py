"""ops/winograd.py: Winograd F(2x2,3x3) conv parity.

The op is measured infrastructure (benchmarks/winograd_probe.py — probed
and rejected for dispatch, docs/PERF.md), kept correct so the verdict
stays reproducible.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_tagger_tpu.ops.winograd import conv3x3_winograd


def _direct(x, k, b=None):
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out if b is None else out + b


@pytest.mark.parametrize("shape,cout", [((1, 8, 8, 4), 4),
                                        ((2, 16, 12, 8), 16),
                                        ((1, 6, 10, 3), 5)])
def test_winograd_matches_direct_fp32(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)) * 0.2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    out = jax.jit(lambda x, k, b: conv3x3_winograd(
        x, k, b, compute_dtype=jnp.float32))(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_direct(x, k, b)),
                               rtol=1e-4, atol=1e-5)


def test_winograd_bf16_error_same_order_as_direct():
    """bf16 Winograd error must stay within ~4x of the direct conv's own
    bf16 error (measured ~2.3x; the transforms add about one bit)."""
    rng = np.random.default_rng(1)
    n, h, w, c = 2, 32, 32, 16
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)) / (3 * c ** 0.5),
                    jnp.float32)
    ref = np.asarray(_direct(x, k))
    direct16 = np.asarray(jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16)).astype(np.float32)
    wino16 = np.asarray(jax.jit(lambda x, k: conv3x3_winograd(
        x.astype(jnp.bfloat16), k, None))(x, k)).astype(np.float32)

    def rms(a):
        return float(np.sqrt(np.mean(np.square(a - ref))))

    assert rms(wino16) < 4 * rms(direct16), (rms(wino16), rms(direct16))
