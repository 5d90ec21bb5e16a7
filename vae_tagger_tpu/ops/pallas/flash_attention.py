"""Blockwise (flash) attention for the VAE mid-block, single head.

Shapes: q, k, v are (B, S, D) with D = mid-block channels (512 for FLUX).
S is the full latent grid — 4,096 tokens at 512px input, 16,384 at 1024px —
so materializing the (S, S) score matrix costs up to 1 GiB fp32 per image.
This kernel keeps O(block) memory via the standard streaming-softmax
recurrence and accumulates in fp32 on the MXU.

Grid layout: (batch, q_blocks, k_blocks) with the k dimension innermost; TPU
grids execute sequentially, so the per-q-block accumulators (m, l, acc) live
in VMEM scratch and persist across the k iterations.

The backward pass currently recomputes attention with the XLA reference path
(correct, memory-heavy); a Pallas backward kernel is the planned upgrade.
Gradient-free inference — the benchmark path — runs entirely in this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(-1e30)


def _choose_block(s: int, target: int) -> int:
    """Largest multiple of 128 that divides nothing in particular — we pad S
    to a multiple of the block, so just cap the block at the padded size."""
    return min(target, _round_up(s, 128))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
                  *, scale: float, seq_len: int, block_k: int):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)

    # mask out padded key columns (S was padded up to a block multiple)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]                       # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                      # (bq, bk)
    alpha = jnp.exp(m_prev - m_new)             # (bq, 1)
    l_ref[:] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape
    )
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kb == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_attention_fwd_impl(q, k, v, block_q: int = 512, block_k: int = 512):
    b, s, d = q.shape
    scale = 1.0 / (d ** 0.5)

    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(s, 128))
    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        pad = [(0, 0), (0, s_pad - s), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (b, s_pad // block_q, s_pad // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, seq_len=s, block_k=block_k
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s_pad * s_pad * d,
            bytes_accessed=3 * b * s_pad * d * q.dtype.itemsize
            + b * s_pad * d * q.dtype.itemsize,
            transcendentals=b * s_pad * s_pad,
        ),
    )(q, k, v)
    return out[:, :s, :]


def _xla_attention_f32(q, k, v):
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", weights.astype(v.dtype), v)


@jax.custom_vjp
def flash_attention(q, k, v):
    return _flash_attention_fwd_impl(q, k, v)


def _fwd(q, k, v):
    return _flash_attention_fwd_impl(q, k, v), (q, k, v)


def _bwd(res, g):
    # Recompute with the XLA path and differentiate through it.  O(S^2)
    # memory — acceptable for training resolutions; to be replaced by a
    # Pallas backward kernel.
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention_f32, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
