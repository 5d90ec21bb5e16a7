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
    in-context (the production dtype), always against the on-chip fp32
    XLA reference; the xla-bf16 column is the precision floor that
    separates "bf16 rounding" from "kernel divergence".

Tolerances are asserted here (max |err| / max |ref|, i.e. error relative
to the output scale): fp32 paths must sit at reduction-order noise, bf16
paths within a small multiple of the XLA-bf16 floor.  Results land in
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

# rel = max|candidate - xla_fp32| / max|xla_fp32|.  fp32 bounds are pure
# Mosaic-vs-XLA reduction-order noise; bf16 bounds cover input rounding +
# bf16 arithmetic (the xla_bf16 floor is recorded next to each entry so a
# kernel-specific excess is visible even inside the bound).
TOL = {"fp32": 5e-5, "bf16": 5e-2}
# backward amplifies through the softmax jacobian; grads are still fp32-
# accumulated in both implementations
TOL_GRAD = {"fp32": 2e-4, "bf16": 8e-2}


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

    ref_fwd, ref_grads = run(_xla_attention, jnp.float32)
    ref_fwd = jnp.asarray(ref_fwd, jnp.float32)
    ref_grads = [jnp.asarray(gr, jnp.float32) for gr in ref_grads]

    for label, attn_fn, dtype in (
            ("pallas_fp32", flash_attention, jnp.float32),
            ("pallas_bf16", flash_attention, jnp.bfloat16),
            ("xla_bf16", _xla_attention, jnp.bfloat16)):
        fwd, grads = run(attn_fn, dtype)
        entry[label] = {
            "fwd_rel_err": rel_err(fwd, ref_fwd),
            "dq_rel_err": rel_err(grads[0], ref_grads[0]),
            "dk_rel_err": rel_err(grads[1], ref_grads[1]),
            "dv_rel_err": rel_err(grads[2], ref_grads[2]),
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

    ref = run("xla", jnp.float32)
    entry["pallas_fp32"] = {"fwd_rel_err": rel_err(run("pallas",
                                                       jnp.float32), ref)}
    entry["pallas_bf16"] = {"fwd_rel_err": rel_err(run("pallas",
                                                       jnp.bfloat16), ref)}
    entry["xla_bf16"] = {"fwd_rel_err": rel_err(run("xla",
                                                    jnp.bfloat16), ref)}
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

    ref = run("xla", jnp.float32)
    entry["pallas_fp32"] = {"fwd_rel_err": rel_err(run("pallas",
                                                       jnp.float32), ref)}
    entry["pallas_bf16"] = {"fwd_rel_err": rel_err(run("pallas",
                                                       jnp.bfloat16), ref)}
    entry["xla_bf16"] = {"fwd_rel_err": rel_err(run("xla",
                                                    jnp.bfloat16), ref)}
    return entry


def check(entry, name):
    """Assert the tolerance table; return list of violations."""
    bad = []
    for path in ("pallas_fp32", "pallas_bf16"):
        if path not in entry:
            continue
        prec = path.split("_")[1]
        for metric, val in entry[path].items():
            tol = (TOL_GRAD if metric.startswith("d") else TOL)[prec]
            if val > tol:
                bad.append(f"{name}.{path}.{metric}={val:.3e} > {tol:.0e}")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_report", action="store_true")
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    results = {"tolerances": {"fwd": TOL, "grad": TOL_GRAD},
               "note": "max|err|/max|ref| vs on-chip fp32 XLA reference; "
                       "xla_bf16 is the precision floor (bf16 rounding "
                       "alone); pallas_fp32 isolates Mosaic-vs-XLA "
                       "divergence.  Asserted by benchmarks/"
                       "kernel_numerics.py on every run.",
               "cases": {}}
    cases = results["cases"]
    violations = []

    # flash attention: the two dispatch shapes from ops/attention.py
    for name, (b, s, d) in (
            ("flash_s16384_bs1_d512", (1, 16384, 512)),
            ("flash_s4096_bs8_d512", (8, 4096, 512))):
        print(f"auditing {name} (fwd + dq/dk/dv)...")
        cases[name] = audit_flash_attention(b, s, d, {"shape": [b, s, d]})
        violations += check(cases[name], name)
        print(json.dumps(cases[name], indent=1))

    # GroupNorm+SiLU: whole-sample (auto-dispatched; engages when
    # 4*s*c*itemsize fits scoped VMEM — small-grid stages) + the
    # grid-chunked variant at the big 1024px GN sites (forced)
    for name, (n, h, w, c, chunked) in (
            ("gn_silu_32x32x512", (4, 32, 32, 512, False)),    # 256px mid
            ("gn_silu_64x64x128", (4, 64, 64, 128, False)),
            ("gn_silu_chunk_1024x1024x128", (1, 1024, 1024, 128, True)),
            ("gn_silu_chunk_128x128x512", (2, 128, 128, 512, True))):
        print(f"auditing {name}...")
        cases[name] = audit_gn_silu(n, h, w, c, 32,
                                    {"shape": [n, h, w, c]}, chunked=chunked)
        violations += check(cases[name], name)
        print(json.dumps(cases[name], indent=1))

    # fused GN+SiLU+conv3x3 (forced; OFF in auto policy but forcible)
    for name, (n, h, w, ci, co, variant) in (
            ("conv_fused_res_128x128x512", (1, 128, 128, 512, 512,
                                            "residual")),
            ("conv_fused_res_256x256x512", (1, 256, 256, 512, 512,
                                            "residual")),
            ("conv_fused_sc_512x512_128to256", (1, 512, 512, 128, 256,
                                                "shortcut"))):
        print(f"auditing {name}...")
        cases[name] = audit_conv_fused(
            n, h, w, ci, co, variant, 32,
            {"shape": [n, h, w, ci, co], "variant": variant})
        violations += check(cases[name], name)
        print(json.dumps(cases[name], indent=1))

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
