#!/usr/bin/env python
"""On-chip Pallas kernel numerics audit: Mosaic-compiled vs XLA, real TPU.

Every Pallas kernel in ops/ has interpret-mode parity tests
(tests/test_pallas.py), but interpret mode runs the kernel body as plain
JAX on CPU — it validates the *algorithm*, not the Mosaic compilation.
This script closes that gap (VERDICT r4 next #2): at the production shapes
named in the dispatch policy (ops/backend.py, ops/attention.py), it runs
each kernel THROUGH ITS REAL DISPATCH PATH on the chip and compares against
the XLA reference implementation the backward passes already trust:

  - flash attention forward AND backward (grads wrt q/k/v — the backward
    kernels are the one Mosaic surface nothing else numerics-checks on
    hardware) at the two dispatch shapes: S=16384 (1024px mid-block) and
    S=4096 bs8 (the 512px training crossover, ops/attention.py:49);
  - whole-sample GroupNorm+SiLU (auto-dispatched) at the fits-in-VMEM
    stage shapes, plus the grid-chunked variant and the fused
    GN+SiLU+conv3x3 kernel (both OFF in auto policy but forcible via
    backend "pallas" — if they can be forced, they must be correct);
  - each comparison at fp32 (isolates Mosaic-vs-XLA divergence) and bf16
    in-context (the production dtype), always against the on-chip
    TRUE-fp32 XLA reference (matmul precision "highest": on TPU a
    default-precision fp32 matmul feeds the MXU's bf16 multiply passes,
    measured ~2e-3 rel err at the S=16k attention shape, so a naive fp32
    "reference" would itself carry default-precision noise);
  - two measured floor columns: xla_fp32_default (same XLA graph, default
    MXU precision — the fp32 floor for matmul-bearing kernels) and
    xla_bf16 (bf16 rounding — the bf16 floor).

Tolerances are asserted here (max |err| / max |ref|, i.e. error relative
to the output scale): each pallas row must sit within
max(absolute tol, FLOOR_MULT x its measured floor).  Results land in
benchmarks/report.json::kernel_numerics_onchip; bounds are quoted in
docs/PERF.md.

Run on the TPU host (axon env): plain `python benchmarks/kernel_numerics.py`.
Inputs are generated ON DEVICE (host->device through the relay is ~45 MB/s,
CLAUDE.md pitfall).  Reference counterpart trust chain: the reference
inherits xformers/cuDNN numerics untested (/root/reference/train_full.py:
55-57); our from-scratch kernels get this audit instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

REPORT = os.path.join(REPO, "benchmarks", "report.json")

# rel = max|candidate - ref| / max|ref| where ref is TRUE-fp32 XLA: the
# reference runs under jax.default_matmul_precision("highest"), because on
# TPU a default-precision "fp32" matmul feeds the MXU bf16 multiply passes
# (fp32 accumulate) — measured on this chip at ~2e-3 rel err for S=16k
# attention, i.e. 40x the naive 5e-5 "fp32 reduction noise" guess.  Two
# gates per row, the looser wins:
#   - the absolute floor below (reduction-order noise for matmul-free
#     kernels like GroupNorm, which do hit true fp32 noise);
#   - FLOOR_MULT x the measured same-graph XLA floor at the same precision
#     policy (xla_fp32_default for fp32 rows, xla_bf16 for bf16 rows) —
#     Mosaic miscompilation lands orders of magnitude above either.
TOL = {"fp32": 5e-5, "bf16": 5e-2}
# backward amplifies through the softmax jacobian; grads are still fp32-
# accumulated in both implementations
TOL_GRAD = {"fp32": 2e-4, "bf16": 8e-2}
FLOOR_MULT = 4.0


def rel_err(candidate, ref_f32):
    c = jnp.asarray(candidate, jnp.float32)
    scale = jnp.max(jnp.abs(ref_f32))
    return float(jax.device_get(
        jnp.max(jnp.abs(c - ref_f32)) / jnp.maximum(scale, 1e-12)))


def on_device_normal(key, shape, scale=1.0):
    return jax.jit(lambda k: scale * jax.random.normal(k, shape, jnp.float32)
                   )(jax.random.key(key))


def audit_flash_attention(batch, seq, dim, entry):
    """Forward + backward (dq/dk/dv) parity at one dispatch shape."""
    from vae_tagger_tpu.ops.attention import _xla_attention
    from vae_tagger_tpu.ops.pallas.flash_attention import flash_attention

    q = on_device_normal(0, (batch, seq, dim))
    k = on_device_normal(1, (batch, seq, dim))
    v = on_device_normal(2, (batch, seq, dim))
    g = on_device_normal(3, (batch, seq, dim))

    def scalar(attn_fn, q, k, v):
        return jnp.sum(attn_fn(q, k, v).astype(jnp.float32) * g)

    def run(attn_fn, dtype):
        args = [a.astype(dtype) for a in (q, k, v)]
        fwd = jax.jit(lambda *a: attn_fn(*a))(*args)
        grads = jax.jit(jax.grad(lambda *a: scalar(attn_fn, *a),
                                 argnums=(0, 1, 2)))(*args)
        return jax.device_get((fwd, grads))

    # TRUE-fp32 reference: force full-precision MXU passes; the production
    # paths below run the default policy they actually dispatch with
    with jax.default_matmul_precision("highest"):
        ref_fwd, ref_grads = run(_xla_attention, jnp.float32)
    ref_fwd = jnp.asarray(ref_fwd, jnp.float32)
    ref_grads = [jnp.asarray(gr, jnp.float32) for gr in ref_grads]

    outs = {}
    for label, attn_fn, dtype in (
            ("xla_fp32_default", _xla_attention, jnp.float32),
            ("pallas_fp32", flash_attention, jnp.float32),
            ("pallas_bf16", flash_attention, jnp.bfloat16),
            ("xla_bf16", _xla_attention, jnp.bfloat16)):
        fwd, grads = run(attn_fn, dtype)
        outs[label] = (fwd, grads)
        entry[label] = {
            "fwd_rel_err": rel_err(fwd, ref_fwd),
            "dq_rel_err": rel_err(grads[0], ref_grads[0]),
            "dk_rel_err": rel_err(grads[1], ref_grads[1]),
            "dv_rel_err": rel_err(grads[2], ref_grads[2]),
        }
    # direct kernel-vs-XLA deviation at MATCHED precision: the columns
    # above share the vs-fp32-ref rounding floor, whose max can land on
    # the same element for both paths (measured: bit-identical bf16
    # max-err columns while the outputs differ elsewhere); this one
    # cannot coincide that way
    for plab, xlab in (("pallas_fp32", "xla_fp32_default"),
                       ("pallas_bf16", "xla_bf16")):
        pf, pg = outs[plab]
        xf, xg = outs[xlab]
        entry[plab]["vs_xla_same_precision"] = {
            "fwd": rel_err(pf, jnp.asarray(xf, jnp.float32)),
            "dq": rel_err(pg[0], jnp.asarray(xg[0], jnp.float32)),
            "dk": rel_err(pg[1], jnp.asarray(xg[1], jnp.float32)),
            "dv": rel_err(pg[2], jnp.asarray(xg[2], jnp.float32)),
        }
    return entry


def audit_gn_silu(n, h, w, c, groups, entry, chunked=False):
    """Whole-sample (or grid-chunked) GN+SiLU kernel vs XLA two-pass."""
    from vae_tagger_tpu.ops import backend
    from vae_tagger_tpu.ops.normalization import group_norm_silu
    from vae_tagger_tpu.ops.pallas.groupnorm_silu import fits_in_vmem

    x = on_device_normal(10, (n, h, w, c), scale=2.0)
    scale = on_device_normal(11, (c,), scale=0.5)
    bias = on_device_normal(12, (c,), scale=0.5)

    whole = fits_in_vmem(h * w, c, 2)
    entry["kernel"] = "chunked" if chunked else "whole_sample"
    if chunked == whole:  # shape lands on the other variant: record & skip
        entry["skipped"] = (f"h*w={h*w} c={c} dispatches to the "
                            f"{'whole-sample' if whole else 'chunked'} "
                            "kernel, not this one")
        return entry

    def run(backend_name, dtype):
        args = (x.astype(dtype), scale.astype(dtype), bias.astype(dtype))
        # backend "pallas" forces BOTH variants on (use_pallas is
        # unconditional there); which one runs is decided by fits_in_vmem,
        # checked above so the label matches the kernel that executed
        with backend.backend(backend_name):
            out = jax.jit(lambda *a: group_norm_silu(
                *a, num_groups=groups))(*args)
        return jnp.asarray(jax.device_get(out), jnp.float32)

    # GN+SiLU's only matmuls are the (1,C)@(C,G) stats reductions, pinned
    # to HIGHEST precision in the kernel (a default-precision MXU pass
    # bf16-rounds the channel sums — the round-5 audit measured 1e-3 to
    # 3.8e-3 output error from exactly that); fp32 rows must therefore hit
    # true reduction-order noise (absolute TOL)
    ref = run("xla", jnp.float32)
    p32, p16, x16 = (run("pallas", jnp.float32), run("pallas", jnp.bfloat16),
                     run("xla", jnp.bfloat16))
    entry["pallas_fp32"] = {"fwd_rel_err": rel_err(p32, ref)}
    entry["pallas_bf16"] = {"fwd_rel_err": rel_err(p16, ref),
                            "vs_xla_same_precision": {
                                "fwd": rel_err(p16, jnp.asarray(
                                    x16, jnp.float32))}}
    entry["xla_bf16"] = {"fwd_rel_err": rel_err(x16, ref)}
    return entry


def audit_conv_fused(n, h, w, c_in, c_out, variant, groups, entry):
    """Fused GN+SiLU+conv3x3 [+residual / +1x1-shortcut] vs XLA reference."""
    from vae_tagger_tpu.ops import backend
    from vae_tagger_tpu.ops.conv import gn_silu_conv3x3
    from vae_tagger_tpu.ops.pallas.conv_fused import plan_fused_conv

    plan = plan_fused_conv(h, w, c_in, c_out,
                           c_in if variant != "plain" else None, 2)
    if plan is None:
        entry["skipped"] = "plan_fused_conv declined this shape"
        return entry

    x = on_device_normal(20, (n, h, w, c_in), scale=2.0)
    gsc = on_device_normal(21, (c_in,), scale=0.5)
    gbi = on_device_normal(22, (c_in,), scale=0.5)
    kern = on_device_normal(23, (3, 3, c_in, c_out), scale=0.05)
    bias = on_device_normal(24, (c_out,), scale=0.5)
    res = on_device_normal(25, (n, h, w, c_in), scale=1.0)
    sck = on_device_normal(26, (1, 1, c_in, c_out), scale=0.1)
    scb = on_device_normal(27, (c_out,), scale=0.5)

    def run(backend_name, dtype):
        args = [x, gsc, gbi, kern, bias]
        if variant == "residual":
            args.append(res)
        elif variant == "shortcut":
            args += [res, sck, scb]
        args = [a.astype(dtype) for a in args]
        with backend.backend(backend_name):
            if variant == "shortcut":
                out = jax.jit(lambda x_, g_, b_, k_, bi_, r_, sk_, sb_:
                              gn_silu_conv3x3(x_, g_, b_, k_, bi_, r_, sk_,
                                              sb_, num_groups=groups))(*args)
            elif variant == "residual":
                out = jax.jit(lambda x_, g_, b_, k_, bi_, r_:
                              gn_silu_conv3x3(x_, g_, b_, k_, bi_, r_,
                                              num_groups=groups))(*args)
            else:
                out = jax.jit(lambda x_, g_, b_, k_, bi_:
                              gn_silu_conv3x3(x_, g_, b_, k_, bi_,
                                              num_groups=groups))(*args)
        return jnp.asarray(jax.device_get(out), jnp.float32)

    # conv IS a matmul on the MXU: true-fp32 reference + measured
    # default-precision floor, exactly as in the attention audit
    with jax.default_matmul_precision("highest"):
        ref = run("xla", jnp.float32)
    x32, p32 = run("xla", jnp.float32), run("pallas", jnp.float32)
    x16, p16 = run("xla", jnp.bfloat16), run("pallas", jnp.bfloat16)
    entry["xla_fp32_default"] = {"fwd_rel_err": rel_err(x32, ref)}
    entry["pallas_fp32"] = {"fwd_rel_err": rel_err(p32, ref),
                            "vs_xla_same_precision": {
                                "fwd": rel_err(p32, x32)}}
    entry["pallas_bf16"] = {"fwd_rel_err": rel_err(p16, ref),
                            "vs_xla_same_precision": {
                                "fwd": rel_err(p16, jnp.asarray(
                                    x16, jnp.float32))}}
    entry["xla_bf16"] = {"fwd_rel_err": rel_err(x16, ref)}
    return entry


def check(entry, name):
    """Assert the tolerance table; return list of violations.

    Per row the bound is max(absolute TOL, FLOOR_MULT x the measured
    same-precision XLA floor): fp32 rows measure against
    xla_fp32_default (MXU default-precision noise, zero for matmul-free
    kernels), bf16 rows against xla_bf16 (bf16 rounding).
    """
    bad = []
    for path in ("pallas_fp32", "pallas_bf16"):
        if path not in entry:
            continue
        prec = path.split("_")[1]
        floor_row = entry.get("xla_fp32_default" if prec == "fp32"
                              else "xla_bf16", {})
        for metric, val in entry[path].items():
            if not isinstance(val, float):
                continue  # diagnostic sub-dicts (vs_xla_same_precision)
            base = (TOL_GRAD if metric.startswith("d") else TOL)[prec]
            tol = max(base, FLOOR_MULT * floor_row.get(metric, 0.0))
            if val > tol:
                bad.append(f"{name}.{path}.{metric}={val:.3e} > {tol:.1e}")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_report", action="store_true")
    ap.add_argument("--only", default="",
                    help="substring filter on case names (e.g. 'gn_silu'); "
                         "results MERGE into the existing report entry and "
                         "the gate is recomputed over all merged cases")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    results = {"tolerances": {"fwd": TOL, "grad": TOL_GRAD,
                              "floor_mult": FLOOR_MULT},
               "note": "max|err|/max|ref| vs on-chip TRUE-fp32 XLA "
                       "reference (matmul precision 'highest' — default-"
                       "precision fp32 matmuls run MXU bf16 passes on "
                       "this chip).  Per-row bound: max(abs tol, "
                       "floor_mult x measured same-precision XLA floor): "
                       "xla_fp32_default for fp32 rows, xla_bf16 for "
                       "bf16 rows.  Asserted by benchmarks/"
                       "kernel_numerics.py on every run.",
               "cases": {}}
    cases = results["cases"]

    def wanted(name):
        return args.only in name

    # flash attention: the two dispatch shapes from ops/attention.py
    for name, (b, s, d) in (
            ("flash_s16384_bs1_d512", (1, 16384, 512)),
            ("flash_s4096_bs8_d512", (8, 4096, 512))):
        if not wanted(name):
            continue
        print(f"auditing {name} (fwd + dq/dk/dv)...")
        cases[name] = audit_flash_attention(b, s, d, {"shape": [b, s, d]})
        print(json.dumps(cases[name], indent=1))

    # GroupNorm+SiLU: whole-sample (auto-dispatched; engages when
    # 4*s*c*itemsize fits scoped VMEM — small-grid stages) + the
    # grid-chunked variant at the big 1024px GN sites (forced)
    for name, (n, h, w, c, chunked) in (
            ("gn_silu_32x32x512", (4, 32, 32, 512, False)),    # 256px mid
            ("gn_silu_64x64x128", (4, 64, 64, 128, False)),
            ("gn_silu_chunk_1024x1024x128", (1, 1024, 1024, 128, True)),
            ("gn_silu_chunk_128x128x512", (2, 128, 128, 512, True))):
        if not wanted(name):
            continue
        print(f"auditing {name}...")
        cases[name] = audit_gn_silu(n, h, w, c, 32,
                                    {"shape": [n, h, w, c]}, chunked=chunked)
        print(json.dumps(cases[name], indent=1))

    # fused GN+SiLU+conv3x3 (forced; OFF in auto policy but forcible)
    for name, (n, h, w, ci, co, variant) in (
            ("conv_fused_res_128x128x512", (1, 128, 128, 512, 512,
                                            "residual")),
            ("conv_fused_res_256x256x512", (1, 256, 256, 512, 512,
                                            "residual")),
            ("conv_fused_sc_512x512_128to256", (1, 512, 512, 128, 256,
                                                "shortcut"))):
        if not wanted(name):
            continue
        print(f"auditing {name}...")
        cases[name] = audit_conv_fused(
            n, h, w, ci, co, variant, 32,
            {"shape": [n, h, w, ci, co], "variant": variant})
        print(json.dumps(cases[name], indent=1))

    # merge with any previously recorded cases, then gate over the union
    # (lets --only re-audit a fixed kernel without rerunning the rest)
    if not args.skip_report and os.path.exists(REPORT):
        with open(REPORT) as f:
            prev = json.load(f).get("kernel_numerics_onchip", {})
        merged = dict(prev.get("cases", {}))
        merged.update(cases)
        results["cases"] = cases = merged

    violations = []
    for name, entry in cases.items():
        violations += check(entry, name)

    results["gate"] = "PASS" if not violations else "FAIL"
    if violations:
        results["violations"] = violations

    if not args.skip_report:
        with open(REPORT) as f:
            report = json.load(f)
        report["kernel_numerics_onchip"] = results
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=2)
        print(f"updated {REPORT}::kernel_numerics_onchip")

    print(f"gate: {results['gate']}")
    if violations:
        print("\n".join(violations))
        sys.exit(1)


if __name__ == "__main__":
    main()
