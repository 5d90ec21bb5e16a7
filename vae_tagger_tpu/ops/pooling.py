"""Pooling primitives (NHWC, functional).

Torch's ``AdaptiveAvgPool2d((oh, ow))`` splits each spatial axis into bins
``[floor(i*S/O), ceil((i+1)*S/O))``.  When S % O == 0 every bin is the same
size and the op is exactly an average-pool with stride S//O — that's the case
for every call site in the reference (latent grids are powers of two pooled to
4x4 / 8x8, ``/root/reference/modules.py:314,381``), and XLA turns it into a
single reduce-window.  The general (uneven) case is handled with a
matmul-by-interpolation-matrix formulation, which maps to the MXU instead of
gather loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bin_matrix(in_size: int, out_size: int, average: bool) -> np.ndarray:
    """(in_size, out_size) matrix M with M[s, o] = weight of input s in output o."""
    m = np.zeros((in_size, out_size), dtype=np.float32)
    for o in range(out_size):
        start = (o * in_size) // out_size
        end = -(-((o + 1) * in_size) // out_size)  # ceil
        w = 1.0 / (end - start) if average else 1.0
        m[start:end, o] = w
    return m


@functools.partial(jax.jit, static_argnums=(1, 2))
def _adaptive_avg_pool_general(x, out_h: int, out_w: int):
    n, h, w, c = x.shape
    mh = jnp.asarray(_bin_matrix(h, out_h, average=True), x.dtype)
    mw = jnp.asarray(_bin_matrix(w, out_w, average=True), x.dtype)
    # contract H then W: (N,H,W,C) x (H,Oh) -> (N,W,C,Oh) -> ...
    y = jnp.einsum("nhwc,ho->nowc", x, mh)
    y = jnp.einsum("nowc,wp->nopc", y, mw)
    return y


def adaptive_avg_pool_nhwc(x, output_size):
    """Adaptive average pool to (oh, ow) over NHWC input.

    Even-division case uses reshape+mean — fully differentiable (a generic
    ``lax.reduce_window`` has no reverse-mode rule) and lowered by XLA to the
    same reduce.
    """
    oh, ow = (output_size, output_size) if isinstance(output_size, int) else output_size
    n, h, w, c = x.shape
    if h == oh and w == ow:
        return x
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return jnp.mean(x.reshape(n, oh, kh, ow, kw, c), axis=(2, 4))
    return _adaptive_avg_pool_general(x, oh, ow)


def adaptive_max_pool_nhwc(x, output_size):
    """Adaptive max pool to (oh, ow) over NHWC input (even-division fast path;
    the reference only ever max-pools to 1x1, ``/root/reference/modules.py:19``)."""
    oh, ow = (output_size, output_size) if isinstance(output_size, int) else output_size
    n, h, w, c = x.shape
    if oh == 1 and ow == 1:
        return jnp.max(x, axis=(1, 2), keepdims=True)
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        return jnp.max(x.reshape(n, oh, kh, ow, kw, c), axis=(2, 4))
    raise NotImplementedError("uneven adaptive max pool not needed by any call site")
