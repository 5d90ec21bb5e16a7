"""Winograd F(2x2, 3x3) convolution — the FLOP-reduction lever.

Round 2 built five fused-conv decompositions (docs/PERF.md); all of them
rearranged the same 9-tap direct computation and none beat XLA's conv
emitter, which pins ~52-56% MFU at the 1024^2 x 128 stage.  Winograd is
the one axis not tried: it computes a 3x3 SAME conv with 2.25x fewer
MXU FLOPs (16 elementwise-tile GEMMs instead of 9 full-size taps), at
the cost of VPU transform work and extra numerics error.

Math (Lavin & Gray, "Fast Algorithms for Convolutional Neural
Networks"): for each 4x4 input tile d (stride 2) and 3x3 kernel g,
  Y = A^T [ (G g G^T) .* (B^T d B) ] A          (2x2 output tile)
summed over input channels — the elementwise product becomes, per tile
position (xi, nu), a GEMM over channels.

This module expresses the algorithm in pure XLA ops (slices, adds,
einsums) so the compiler schedules it; a Pallas variant only makes sense
if the XLA form shows the FLOP cut is realizable (benchmarks/
winograd_probe.py measures it in-context).  Numerics: transforms and
GEMM accumulate in fp32 (tests/test_winograd.py measures bf16 error vs
the direct conv's own bf16 error).

Reference behavior matched: diffusers ResnetBlock 3x3 SAME convs
(/root/reference/diffusers_vae_loader.py:8-35 instantiates them via
AutoencoderKL).

STATUS: KEPT FOR EVIDENCE, NON-DISPATCHED.  Measured in-context on the
v5e (benchmarks/winograd_probe.py, docs/PERF.md "Winograd"), this form
lost to XLA's direct conv at every VAE stage shape, so it is deliberately
absent from ops/backend.py's auto policy and no production path imports
it.  It stays importable (with its parity tests) so the negative result
remains reproducible; re-wire only with a new on-chip measurement.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# B^T (4x4): input transform; rows have two +-1 taps -> pure adds
_BT = np.array([[1, 0, -1, 0],
                [0, 1, 1, 0],
                [0, -1, 1, 0],
                [0, 1, 0, -1]], np.float32)
# G (4x3): kernel transform
_G = np.array([[1, 0, 0],
               [0.5, 0.5, 0.5],
               [0.5, -0.5, 0.5],
               [0, 0, 1]], np.float32)
# A^T (2x4): output transform
_AT = np.array([[1, 1, 1, 0],
                [0, 1, -1, -1]], np.float32)


def transform_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """HWIO (3,3,Cin,Cout) -> (4,4,Cin,Cout) Winograd-domain weights.

    Computed in fp32 (weights are tiny; this runs once per call and XLA
    hoists it for repeated use under jit with the same params)."""
    g = kernel.astype(jnp.float32)
    u = jnp.einsum("xi,ijco->xjco", jnp.asarray(_G), g)
    return jnp.einsum("yj,xjco->xyco", jnp.asarray(_G), u)


def conv3x3_winograd(x: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None = None,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """SAME-padding stride-1 3x3 conv of NHWC ``x`` via Winograd F(2x2,3x3).

    H and W must be even (true for every VAE stage at the pow-2-bucketed
    resolutions).  GEMMs run in ``compute_dtype`` inputs with fp32
    accumulation; transforms are exact +-1/2 combinations.
    """
    n, h, w, cin = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    cout = kernel.shape[-1]
    th, tw = h // 2, w // 2

    u = transform_kernel(kernel).astype(compute_dtype)  # (4,4,Cin,Cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # d[i][j]: the (i,j)-th element of every 4x4 tile, tiles at stride 2 —
    # shape (N, th, tw, Cin).  Slices, no gather.  Transforms run in fp32
    # (the +-1 adds are exact there; XLA fuses the cast into the adds).
    d = [[jax.lax.slice(xp, (0, i, j, 0), (n, i + 2 * th - 1, j + 2 * tw - 1,
                                           cin), (1, 2, 2, 1))
          .astype(jnp.float32)
          for j in range(4)] for i in range(4)]

    # V = B^T d B, exploiting the +-1 sparsity of B^T: each V[xi][j] is a
    # two-term add of d rows, then each V[xi][nu] a two-term add of those.
    def bt_combine(rows):
        # rows: list of 4 arrays -> list of 4 combined per _BT rows
        return [rows[0] - rows[2],
                rows[1] + rows[2],
                rows[2] - rows[1],
                rows[1] - rows[3]]

    v_rows = [bt_combine([d[i][j] for i in range(4)]) for j in range(4)]
    # v_rows[j][xi]; now combine over j per nu
    v = [[None] * 4 for _ in range(4)]
    for xi in range(4):
        cols = [v_rows[j][xi] for j in range(4)]
        vc = bt_combine(cols)
        for nu in range(4):
            v[xi][nu] = vc[nu]

    # 16 channel GEMMs in the Winograd domain.  The MXU accumulates in
    # fp32 internally; outputs round to compute_dtype so the 16 M tensors
    # (each the size of the layer activation / 4) stay memory-bounded —
    # 16 fp32 copies would be 4x the activation and OOM stage 0 at batch 8.
    m = [[jnp.einsum("nhwc,co->nhwo", v[xi][nu].astype(compute_dtype),
                     u[xi, nu], preferred_element_type=compute_dtype)
          for nu in range(4)] for xi in range(4)]

    # Y = A^T m A: rows first (xi -> p), then cols (nu -> q)
    def at_combine(vals):
        return [vals[0] + vals[1] + vals[2],
                vals[1] - vals[2] - vals[3]]

    y_rows = [at_combine([m[xi][nu] for xi in range(4)]) for nu in range(4)]
    y = [[None] * 2 for _ in range(2)]
    for p in range(2):
        cols = [y_rows[nu][p] for nu in range(4)]
        yc = at_combine(cols)
        for q in range(2):
            y[p][q] = yc[q]

    # interleave the 2x2 output tiles back to (N, H, W, Cout)
    out = jnp.stack([jnp.stack(row, axis=3) for row in y], axis=2)
    # (N, th, 2, tw, 2, Cout) -> (N, H, W, Cout)
    out = out.reshape(n, h, w, cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
