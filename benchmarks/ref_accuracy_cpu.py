#!/usr/bin/env python
"""Head-to-head trained tag-F1: the REFERENCE trainer vs ours, same data.

The north-star (BASELINE.json) asks for "tag-F1 parity".  Throughput
parity is measured per config (run_all.py) and our own trained F1 is
published (accuracy.py); this closes the loop by training the reference's
ACTUAL code end-to-end on this host and scoring it with its own evaluator:

  - both sides get the IDENTICAL seed VAE weights (saved once in diffusers
    layout; the reference loads them via its own diffusers_vae_loader, we
    load them via io/safetensors_io) and the identical synthetic dataset;
  - the reference runs on CPU torch through minimal shims for its two
    uninstalled deps (benchmarks/ref_shims: diffusers.AutoencoderKL backed
    by the parity-tested torch oracle, torchvision.transforms);
  - our train_decoder runs on the scrubbed local-CPU JAX backend with the
    same flags (focal + class-balanced, same lr/epochs/batch);
  - both final evaluations write the same artifact schema
    (evaluation_results_overall.json / optimal_thresholds.json); we
    compare macro-F1/mAP and write
    report.json::accuracy_parity_cpu_64px.

64px keeps the reference's un-jitted CPU epochs in minutes.  Run:
  env PYTHONPATH=/root/repo PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python benchmarks/ref_accuracy_cpu.py
(Reference counterparts: /root/reference/train_decoder.py:30-280,
 evaluation.py:56-77.)
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import argparse
import json
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"
SHIMS = os.path.join(REPO, "benchmarks", "ref_shims")
TESTS = os.path.join(REPO, "tests")
REPORT = os.path.join(REPO, "benchmarks", "report.json")


def clean_cpu_env(extra_path=()):
    """Scrubbed local-CPU env (no axon hooks; see __graft_entry__)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    path = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join(list(extra_path) + [REPO] + path)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def sh(argv, log_path, env=None, cwd=REPO):
    print(f"$ {' '.join(argv[:4])} ... (log: "
          f"{os.path.relpath(log_path, REPO)})", flush=True)
    t0 = time.perf_counter()
    proc = subprocess.run(argv, cwd=cwd, env=env, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True)
    with open(log_path, "w") as f:
        f.write(proc.stdout)
    if proc.returncode != 0:
        sys.stdout.write(proc.stdout[-5000:])
        raise RuntimeError(f"rc={proc.returncode}")
    print(f"  done in {time.perf_counter() - t0:.0f}s", flush=True)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", default=os.path.join(
        REPO, "benchmarks", "_acc_runs", "parity64"))
    ap.add_argument("--images", type=int, default=240)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--skip_report", action="store_true")
    args = ap.parse_args()

    ws = args.workspace
    os.makedirs(ws, exist_ok=True)

    from vae_tagger_tpu.utils import create_synthetic_dataset

    ds_dir = os.path.join(ws, "ds")
    if not os.path.exists(os.path.join(ds_dir, "data.json")):
        create_synthetic_dataset(ds_dir, num_images=args.images,
                                 img_size=64, seed=0)
    data_json = os.path.join(ds_dir, "data.json")
    tags_csv = os.path.join(ds_dir, "tags.csv")

    # ONE seed VAE, shared by both sides.  Small-but-real arch so the
    # reference's un-jitted CPU epochs stay in minutes.
    seed_vae = os.path.join(ws, "seed_vae")
    if not os.path.exists(os.path.join(seed_vae, "config.json")):
        import jax
        import jax.numpy as jnp

        from vae_tagger_tpu.core.config import default_flux_vae_config
        from vae_tagger_tpu.io.safetensors_io import save_vae_pretrained
        from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

        cfg = default_flux_vae_config(block_out_channels=(32, 64, 128, 128),
                                      norm_num_groups=16, latent_channels=16,
                                      sample_size=64)
        model = AutoencoderKL(cfg)
        params = jax.jit(model.init)({"params": jax.random.key(0)},
                                     jnp.zeros((1, 32, 32, 3)),
                                     jax.random.key(1))["params"]
        save_vae_pretrained(jax.device_get(params), cfg, seed_vae)
    vae_ckpt = os.path.join(seed_vae, "diffusion_pytorch_model.safetensors")
    vae_cfg = os.path.join(seed_vae, "config.json")

    flags = ["--vae_checkpoint", vae_ckpt, "--vae_config_path", vae_cfg,
             "--json_path", data_json, "--tags_csv_path", tags_csv,
             "--resolution", "64", "--train_batch_size", "4",
             "--num_epochs", str(args.epochs),
             "--learning_rate", str(args.lr),
             "--use_focal_loss", "--use_class_balanced",
             "--lr_warmup_steps", "20", "--num_workers", "2",
             "--mixed_precision", "no", "--seed", "0",
             "--logging_steps", "1000", "--save_steps", "1000"]

    results = {"config": {"images": args.images, "resolution": 64,
                          "epochs": args.epochs, "lr": args.lr,
                          "vae": "(32,64,128,128) groups16 latent16, "
                                 "identical seed weights both sides",
                          "loss": "focal + class-balanced, bs4"}}

    # ---- the reference, end to end, its own code + evaluator ----------
    ref_out = os.path.join(ws, "ref_out")
    if not os.path.exists(os.path.join(ref_out,
                                       "evaluation_results_overall.json")):
        env = clean_cpu_env(extra_path=(SHIMS, REFERENCE, TESTS))
        dt = sh([sys.executable,
                 os.path.join(REFERENCE, "train_decoder.py"),
                 "--output_dir", ref_out, *flags],
                os.path.join(ws, "ref_train.log"), env=env)
        results["reference_wall_s"] = round(dt, 1)

    with open(os.path.join(ref_out,
                           "evaluation_results_overall.json")) as f:
        ref_overall = json.load(f)
    with open(os.path.join(ref_out, "optimal_thresholds.json")) as f:
        ref_thr = json.load(f)

    # ---- ours, same flags, scrubbed CPU JAX ---------------------------
    ours_out = os.path.join(ws, "ours_out")
    if not os.path.exists(os.path.join(ours_out,
                                       "evaluation_results_overall.json")):
        env = clean_cpu_env()
        dt = sh([sys.executable,
                 os.path.join(REPO, "scripts", "train_decoder.py"),
                 "--output_dir", ours_out, "--cache_latents", *flags],
                os.path.join(ws, "ours_train.log"), env=env)
        results["ours_wall_s"] = round(dt, 1)

    with open(os.path.join(ours_out,
                           "evaluation_results_overall.json")) as f:
        ours_overall = json.load(f)
    with open(os.path.join(ours_out, "optimal_thresholds.json")) as f:
        ours_thr = json.load(f)

    def pick(d):
        return {"f1_macro": round(float(d["f1_macro"]), 4),
                "f1_micro": round(float(d["f1_micro"]), 4),
                "mAP_macro": round(float(d["mAP"]), 4)}

    results["reference"] = pick(ref_overall)
    results["reference"]["global_threshold"] = ref_thr["global_threshold"]
    results["ours"] = pick(ours_overall)
    results["ours"]["global_threshold"] = ours_thr["global_threshold"]
    results["f1_macro_delta_ours_minus_ref"] = round(
        results["ours"]["f1_macro"] - results["reference"]["f1_macro"], 4)
    results["note"] = (
        "identical seed VAE weights + dataset + hyperparameters; val "
        "splits are each trainer's own seeded 90/10 draw (membership "
        "differs, distribution identical).  Reference executed from "
        "/root/reference via benchmarks/ref_shims (torch CPU); ours on "
        "the local-CPU JAX backend.")
    print(json.dumps(results, indent=2))

    with open(os.path.join(ws, "parity.json"), "w") as f:
        json.dump(results, f, indent=2)
    if not args.skip_report:
        with open(REPORT) as f:
            report = json.load(f)
        report["accuracy_parity_cpu_64px"] = results
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=2)
        print(f"updated {REPORT}")


if __name__ == "__main__":
    main()
