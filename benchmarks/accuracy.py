#!/usr/bin/env python
"""Trained-accuracy benchmark: the BASELINE.md accuracy loop, on real TPU.

BASELINE.md's measurement plan promises, for each config, "images/sec, tag
F1 on the synthetic set, and latent MSE" — run_all.py covers throughput;
this script closes the accuracy side (VERDICT r3 next #1).  It trains ON
THE CHIP on the reference-format synthetic fixture set
(utils/synthetic.py = create_test_dataset.py semantics) at 256px — the
fixture's native size, chosen so every run converges in minutes — then
scores the EXPORTED artifacts through the standalone evaluator
(eval/standalone.py -> TaggerEngine round trip) and lands tag_f1/mAP
fields in benchmarks/report.json next to the corresponding configs:

  - train_decoder (BASELINE #4: frozen VAE, focal + class-balanced, bs 4)
      -> report["train_decoder_512px_batch4"]["accuracy"]
  - train_full    (BASELINE #5: triplet + focal + adaptive weights, bf16)
      -> report["train_full_1024px_batch1_remat"]["accuracy"]
  - batch tagging (BASELINE #3) set-based P/R/F1 via
    scripts/batch_inference_test.py on the trained artifacts
      -> report["bucketed_tagging"]["accuracy"]
  - train_vae     recon MSE/PSNR trained-vs-init (the reference's
    vae_reconstruction_test metrics) -> report["train_vae_256px"]
  - latent-MSE parity gate vs the torch oracle (fp32 + bf16), measured on
    this chip with the trained VAE -> report["accuracy_meta"]
  - YUV 4:2:0 quality cost on the trained model (VERDICT r3 next #3)
      -> report["infer_full_e2e_1024px_yuv420"]["quality_vs_rgb"]

Run on the TPU host (axon env): plain `python benchmarks/accuracy.py`.
Reference counterparts: evaluation.py:56-77 (metric suite),
batch_inference_test.py:63-137 (set-based F1),
vae_reconstruction_test.py:103,132-138 (MSE/PSNR).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPORT = os.path.join(REPO, "benchmarks", "report.json")


def sh(argv, log_path):
    """Run-and-log (shared implementation: bench_common.run_logged);
    returns (stdout, wall_seconds)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_common import run_logged
    return run_logged(argv, log_path, echo=len(argv))


def make_seed_vae(out_dir, seed=0):
    """Random-init FULL-architecture FLUX VAE saved in diffusers layout.

    No pretrained FLUX weights exist on this host, so the accuracy loop
    trains from a seeded random init — the same starting point the
    reference would have without its downloaded checkpoint.  Full
    [128, 256, 512, 512] channels / latent 16: the real model, real cost.
    """
    import jax
    import jax.numpy as jnp

    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.io.safetensors_io import save_vae_pretrained
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = default_flux_vae_config()
    model = AutoencoderKL(cfg)
    params = jax.jit(model.init)({"params": jax.random.key(seed)},
                                 jnp.zeros((1, 32, 32, 3)),
                                 jax.random.key(seed + 1))["params"]
    save_vae_pretrained(jax.device_get(params), cfg, out_dir)
    return cfg


def read_overall(output_dir):
    path = os.path.join(output_dir, "evaluation_results_overall.json")
    with open(path) as f:
        overall = json.load(f)
    thr_path = os.path.join(output_dir, "optimal_thresholds.json")
    thresholds = json.load(open(thr_path)) if os.path.exists(thr_path) else {}
    return overall, thresholds


def accuracy_fields(overall, thresholds, extra=None):
    out = {
        "tag_f1_macro": round(overall["f1_macro"], 4),
        "tag_f1_micro": round(overall["f1_micro"], 4),
        "mAP_macro": round(overall["mAP"], 4),
        "mAP_micro": round(overall["mAP_micro"], 4),
        "subset_accuracy": round(overall["accuracy"], 4),
        "hamming_loss": round(overall["hamming_loss"], 4),
        "threshold": thresholds.get("global_threshold"),
    }
    if extra:
        out.update(extra)
    return out


def latent_mse_gate(vae_dir, images, policies=("no", "bf16")):
    """On-chip latents vs the fp32 torch oracle fed identical weights.

    The BASELINE.json gate (latent MSE < 1e-4) measured on the REAL chip
    with the TRAINED weights, not just the CI-size random model."""
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from torch_oracle.vae_torch import AutoencoderKLOracle

    from vae_tagger_tpu.core.precision import resolve_mixed_precision
    from vae_tagger_tpu.infer.engine import load_vae_bundle
    from vae_tagger_tpu.io.safetensors_io import torch_state_from_flax_params
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    from vae_tagger_tpu.ops.image import normalize_uint8

    vae, params = load_vae_bundle(
        f"{vae_dir}/diffusion_pytorch_model.safetensors",
        f"{vae_dir}/config.json")
    cfg = vae.config
    oracle = AutoencoderKLOracle(
        block_out_channels=tuple(cfg.block_out_channels),
        norm_num_groups=cfg.norm_num_groups,
        latent_channels=cfg.latent_channels).eval()
    state = {k: torch.from_numpy(v.copy()) for k, v in
             torch_state_from_flax_params(jax.device_get(params)).items()}
    oracle.load_state_dict(state)

    x_uint8 = images[:2]  # fp32 CPU torch at 256px is slow; 2 images suffice
    x_f32 = (x_uint8.astype("float32") / 255.0) * 2.0 - 1.0
    with torch.no_grad():
        moments = oracle.encode_moments(
            torch.from_numpy(x_f32).permute(0, 3, 1, 2)).numpy()
    mean_t = moments[:, :cfg.latent_channels].transpose(0, 2, 3, 1)

    gate = {}
    for mp in policies:
        policy = resolve_mixed_precision(mp)
        vae_p = AutoencoderKL(cfg, dtype=policy.compute_dtype)

        @jax.jit
        def enc(p, px):
            x = normalize_uint8(px, policy.compute_dtype)  # noqa: B023
            return vae_p.apply({"params": p}, x,  # noqa: B023
                               method=AutoencoderKL.encode).mean
        mean_j = jax.device_get(enc(params, jnp.asarray(x_uint8)))
        mse = float(((mean_j.astype("float32") - mean_t) ** 2).mean())
        key = "latent_mse_fp32" if mp == "no" else f"latent_mse_{mp}"
        gate[key] = mse
    gate["gate"] = "PASS" if all(v < 1e-4 for k, v in gate.items()
                                 if k.startswith("latent_mse")) else "FAIL"
    return gate


def yuv_quality_ab(vae_dir, decoder_bin, tags_csv, data_json, val_paths,
                   labels, resolution, threshold):
    """A/B the lossy YUV 4:2:0 wire format against full RGB on the TRAINED
    model (VERDICT r3 next #3): logit deltas, macro-F1 at the tuned
    threshold, and prediction churn on the val images."""
    import numpy as np
    from sklearn.metrics import f1_score

    from vae_tagger_tpu.data.bucketing import (
        load_and_transform_image,
        load_and_transform_image_yuv,
    )
    from vae_tagger_tpu.infer.engine import TaggerEngine

    engine = TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=decoder_bin, tags_csv_path=tags_csv,
        vae_config_path=f"{vae_dir}/config.json", mixed_precision="bf16")

    rgb = np.stack([load_and_transform_image(p, resolution=resolution)
                    for p in val_paths])
    ys, cbcrs = zip(*[load_and_transform_image_yuv(p, resolution)
                      for p in val_paths])
    probs_rgb = np.asarray(engine.classify(rgb))
    probs_dev, n = engine.classify_yuv_async(np.stack(ys), np.stack(cbcrs))
    import jax
    probs_yuv = np.asarray(jax.device_get(probs_dev))[:n]

    eps = 1e-7
    logits_rgb = np.log(probs_rgb.clip(eps, 1 - eps)
                        / (1 - probs_rgb.clip(eps, 1 - eps)))
    logits_yuv = np.log(probs_yuv.clip(eps, 1 - eps)
                        / (1 - probs_yuv.clip(eps, 1 - eps)))
    d = np.abs(logits_rgb - logits_yuv)

    y_true = (labels > 0).astype(int)
    pred_rgb = (probs_rgb > threshold).astype(int)
    pred_yuv = (probs_yuv > threshold).astype(int)
    churn = float((pred_rgb != pred_yuv).mean())
    flips = int((pred_rgb != pred_yuv).sum())
    f1_rgb = float(f1_score(y_true, pred_rgb, average="macro",
                            zero_division=0))
    f1_yuv = float(f1_score(y_true, pred_yuv, average="macro",
                            zero_division=0))
    return {
        "n_images": len(val_paths),
        "threshold": threshold,
        "logit_delta_mean": round(float(d.mean()), 4),
        "logit_delta_max": round(float(d.max()), 4),
        "prob_delta_mean": round(float(np.abs(probs_rgb - probs_yuv).mean()),
                                 5),
        "macro_f1_rgb": round(f1_rgb, 4),
        "macro_f1_yuv420": round(f1_yuv, 4),
        "macro_f1_delta": round(f1_yuv - f1_rgb, 4),
        "prediction_churn": round(churn, 5),
        "prediction_flips": flips,
        "total_predictions": int(pred_rgb.size),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace",
                    default=os.path.join(REPO, "benchmarks", "_acc_runs"))
    ap.add_argument("--images", type=int, default=240)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--epochs_decoder", type=int, default=30)
    ap.add_argument("--epochs_full", type=int, default=12)
    ap.add_argument("--epochs_vae", type=int, default=8)
    ap.add_argument("--lr_decoder", type=float, default=1e-3)
    ap.add_argument("--lr_full", type=float, default=2e-4)
    ap.add_argument("--lr_vae", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0,
                    help="training seed (replicate runs: same dataset and "
                         "same seed-VAE init as the seed-0 workspace, only "
                         "the training stochasticity — split draw, shuffle, "
                         "mining, dropout — varies; results land in "
                         "report.json::accuracy_meta.replicates)")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe the workspace and retrain from scratch")
    ap.add_argument("--skip_full", action="store_true")
    ap.add_argument("--skip_vae", action="store_true")
    ap.add_argument("--skip_report", action="store_true",
                    help="don't touch benchmarks/report.json")
    args = ap.parse_args()

    base_ws = args.workspace
    ws = base_ws + (f"_s{args.seed}" if args.seed else "")
    # split seed mirrors train/loop.py:81 (`args.seed or 42`) so every
    # scorer below holds out exactly the images the trainer never saw
    split_seed = args.seed or 42
    if args.fresh and os.path.isdir(ws):
        shutil.rmtree(ws)
    os.makedirs(ws, exist_ok=True)

    from vae_tagger_tpu.utils import create_synthetic_dataset

    # replicate runs share the seed-0 dataset and VAE init: only training
    # stochasticity (split draw, shuffle, mining, dropout) varies
    ds_dir = os.path.join(
        base_ws if args.seed and os.path.exists(
            os.path.join(base_ws, "ds", "data.json")) else ws, "ds")
    if not os.path.exists(os.path.join(ds_dir, "data.json")):
        create_synthetic_dataset(ds_dir, num_images=args.images,
                                 img_size=args.resolution, seed=0)
    data_json = os.path.join(ds_dir, "data.json")
    tags_csv = os.path.join(ds_dir, "tags.csv")

    seed_vae = os.path.join(
        base_ws if args.seed and os.path.exists(
            os.path.join(base_ws, "seed_vae", "config.json")) else ws,
        "seed_vae")
    if not os.path.exists(os.path.join(seed_vae, "config.json")):
        print("initializing full-architecture FLUX VAE (random, seed 0)...")
        make_seed_vae(seed_vae)
    vae_ckpt = os.path.join(seed_vae, "diffusion_pytorch_model.safetensors")
    vae_cfg = os.path.join(seed_vae, "config.json")

    results = {"dataset": {"images": args.images,
                           "resolution": args.resolution,
                           "format": "create_test_dataset.py synthetic "
                                     "(shapes x colors x sizes x styles)"}}
    py = sys.executable

    common_data = ["--json_path", data_json, "--tags_csv_path", tags_csv,
                   "--num_workers", "4", "--seed", str(args.seed),
                   "--logging_steps", "1000", "--save_steps", "1000",
                   "--lr_warmup_steps", "20", "--mixed_precision", "bf16",
                   "--resolution", str(args.resolution)]

    # ---- BASELINE #4: train_decoder (frozen VAE, focal + class-balanced)
    dec_out = os.path.join(ws, "decoder_out")
    if not os.path.exists(os.path.join(dec_out, "best_pytorch_model.bin")):
        _, dt = sh([py, "scripts/train_decoder.py",
                    "--vae_checkpoint", vae_ckpt,
                    "--vae_config_path", vae_cfg,
                    "--output_dir", dec_out,
                    "--train_batch_size", "4",
                    "--num_epochs", str(args.epochs_decoder),
                    "--learning_rate", str(args.lr_decoder),
                    "--use_focal_loss", "--use_class_balanced",
                    "--cache_latents", *common_data],
                   os.path.join(ws, "train_decoder.log"))
        results.setdefault("wall_s", {})["train_decoder"] = round(dt, 1)

    dec_eval = os.path.join(ws, "decoder_eval")
    sh([py, "scripts/evaluate.py",
        "--vae_checkpoint", vae_ckpt, "--vae_config_path", vae_cfg,
        "--decoder_checkpoint", os.path.join(dec_out,
                                             "best_pytorch_model.bin"),
        "--json_path", data_json, "--tags_csv_path", tags_csv,
        "--output_dir", dec_eval, "--resolution", str(args.resolution),
        "--batch_size", "8", "--use_val_split", "--seed", str(args.seed),
        "--mixed_precision", "bf16"],
       os.path.join(ws, "eval_decoder.log"))
    overall, thr = read_overall(dec_eval)
    results["train_decoder"] = accuracy_fields(overall, thr, extra={
        "epochs": args.epochs_decoder, "note":
        "frozen random-init FLUX VAE + attention head trained on chip at "
        "256px (focal + class-balanced, bs4, --cache_latents); scored by "
        "eval/standalone.py on the 10% val split through the exported "
        ".bin -> TaggerEngine round trip"})
    print("train_decoder accuracy:", json.dumps(results["train_decoder"]))

    # ---- BASELINE #5: train_full (triplet + focal + adaptive, CombinedLoss)
    full_out = os.path.join(ws, "full_out")
    if not args.skip_full:
        if not os.path.exists(os.path.join(full_out, "best_decoder",
                                           "pytorch_model.bin")):
            _, dt = sh([py, "scripts/train_full.py",
                        "--vae_checkpoint", vae_ckpt,
                        "--vae_config_path", vae_cfg,
                        "--output_dir", full_out,
                        "--train_batch_size", "4",
                        "--num_epochs", str(args.epochs_full),
                        "--learning_rate", str(args.lr_full),
                        "--use_focal_loss", "--use_adaptive_weights",
                        "--no_simplified_loss", *common_data],
                       os.path.join(ws, "train_full.log"))
            results.setdefault("wall_s", {})["train_full"] = round(dt, 1)

        full_eval = os.path.join(ws, "full_eval")
        sh([py, "scripts/evaluate.py",
            "--vae_checkpoint", os.path.join(
                full_out, "best_vae", "diffusion_pytorch_model.safetensors"),
            "--vae_config_path", os.path.join(full_out, "best_vae",
                                              "config.json"),
            "--decoder_checkpoint", os.path.join(full_out, "best_decoder",
                                                 "pytorch_model.bin"),
            "--json_path", data_json, "--tags_csv_path", tags_csv,
            "--output_dir", full_eval, "--resolution", str(args.resolution),
            "--batch_size", "8", "--use_val_split", "--seed",
            str(args.seed),
            "--mixed_precision", "bf16"],
           os.path.join(ws, "eval_full.log"))
        overall_f, thr_f = read_overall(full_eval)
        results["train_full"] = accuracy_fields(overall_f, thr_f, extra={
            "epochs": args.epochs_full, "note":
            "joint VAE+head trained on chip at 256px from random init "
            "(CombinedLoss: recon+KL+triplet+focal with trained adaptive "
            "weights); scored by eval/standalone.py on the val split "
            "through the exported safetensors+bin round trip"})
        print("train_full accuracy:", json.dumps(results["train_full"]))

        # ---- BASELINE #3: set-based batch-inference F1 on trained artifacts
        bi_out = os.path.join(ws, "batch_test")
        sh([py, "scripts/batch_inference_test.py",
            "--vae_checkpoint", os.path.join(
                full_out, "best_vae", "diffusion_pytorch_model.safetensors"),
            "--vae_config_path", os.path.join(full_out, "best_vae",
                                              "config.json"),
            "--decoder_checkpoint", os.path.join(full_out, "best_decoder",
                                                 "pytorch_model.bin"),
            "--tags_csv_path", tags_csv,
            "--image_dir", os.path.join(ds_dir, "images"),
            "--data_json_path", data_json,
            "--output_dir", bi_out, "--max_images", "48",
            "--confidence_threshold",
            str(thr_f.get("global_threshold", 0.3)),
            "--resolution", str(args.resolution), "--batch_size", "8"],
           os.path.join(ws, "batch_test.log"))
        with open(os.path.join(bi_out, "batch_test_results.json")) as f:
            bt = json.load(f)
        results["batch_inference"] = {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in bt.items() if not isinstance(v, (list, dict))}
        print("batch_inference set metrics:",
              json.dumps(results["batch_inference"]))

        # ---- YUV 4:2:0 quality A/B on the trained model
        from vae_tagger_tpu.data.dataset import TaggedImageDataset
        from vae_tagger_tpu.data.loader import train_val_split

        dataset = TaggedImageDataset(json_path=data_json,
                                     tags_csv_path=tags_csv,
                                     resolution=args.resolution,
                                     return_triplets=False, seed=0)
        _, val_idx = train_val_split(len(dataset), 0.1, seed=split_seed)
        val_paths = [dataset.image_paths[i] for i in val_idx]
        val_labels = dataset.labels_matrix[val_idx]
        results["yuv420_quality"] = yuv_quality_ab(
            os.path.join(full_out, "best_vae"),
            os.path.join(full_out, "best_decoder", "pytorch_model.bin"),
            tags_csv, data_json, val_paths, val_labels, args.resolution,
            float(thr_f.get("global_threshold", 0.5)))
        print("yuv420 quality vs rgb:",
              json.dumps(results["yuv420_quality"]))

        # ---- latent-MSE parity gate on the TRAINED VAE, on this chip
        import numpy as np

        from vae_tagger_tpu.data.bucketing import load_and_transform_image
        gate_imgs = np.stack([
            load_and_transform_image(p, resolution=args.resolution)
            for p in val_paths[:2]])
        results["latent_mse_gate"] = latent_mse_gate(
            os.path.join(full_out, "best_vae"), gate_imgs)
        print("latent parity gate:", json.dumps(results["latent_mse_gate"]))

    # ---- train_vae: recon MSE/PSNR trained vs init
    if not args.skip_vae:
        vae_out = os.path.join(ws, "vae_out")
        if not os.path.exists(os.path.join(vae_out, "best_vae",
                                           "config.json")):
            _, dt = sh([py, "scripts/train_vae.py",
                        "--vae_checkpoint", vae_ckpt,
                        "--vae_config_path", vae_cfg,
                        "--output_dir", vae_out,
                        "--train_batch_size", "4",
                        "--num_epochs", str(args.epochs_vae),
                        "--learning_rate", str(args.lr_vae),
                        *common_data],
                       os.path.join(ws, "train_vae.log"))
            results.setdefault("wall_s", {})["train_vae"] = round(dt, 1)

        import jax
        import jax.numpy as jnp
        import numpy as np

        from vae_tagger_tpu.data.bucketing import load_and_transform_image
        from vae_tagger_tpu.data.dataset import TaggedImageDataset
        from vae_tagger_tpu.data.loader import train_val_split
        from vae_tagger_tpu.infer.engine import load_vae_bundle
        from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
        from vae_tagger_tpu.ops.image import normalize_uint8

        dataset = TaggedImageDataset(json_path=data_json,
                                     tags_csv_path=tags_csv,
                                     resolution=args.resolution,
                                     return_triplets=False, seed=0)
        _, val_idx = train_val_split(len(dataset), 0.1, seed=split_seed)
        imgs = np.stack([load_and_transform_image(
            dataset.image_paths[i], resolution=args.resolution)
            for i in val_idx[:8]])

        def recon_mse(ckpt_dir):
            vae, params = load_vae_bundle(
                f"{ckpt_dir}/diffusion_pytorch_model.safetensors",
                f"{ckpt_dir}/config.json")

            @jax.jit
            def run(p, px):
                x = normalize_uint8(px)
                post = vae.apply({"params": p}, x,
                                 method=AutoencoderKL.encode)
                recon = vae.apply({"params": p}, post.mode(),
                                  method=AutoencoderKL.decode)
                return jnp.mean(jnp.square(recon - x))

            return float(jax.device_get(run(params, jnp.asarray(imgs))))

        mse_trained = recon_mse(os.path.join(vae_out, "best_vae"))
        mse_init = recon_mse(seed_vae)
        # PSNR convention from vae_reconstruction_test.py:137-138
        psnr = lambda mse: 20 * np.log10(2) - 10 * np.log10(mse)  # noqa:E731
        results["train_vae"] = {
            "epochs": args.epochs_vae,
            "recon_mse_trained": round(mse_trained, 5),
            "recon_mse_init": round(mse_init, 5),
            "psnr_trained_db": round(float(psnr(mse_trained)), 2),
            "psnr_init_db": round(float(psnr(mse_init)), 2),
            "note": "val-image reconstruction (encode mode -> decode), "
                    "[-1,1] scale; PSNR = 20log10(2) - 10log10(MSE) as in "
                    "the reference vae_reconstruction_test.py"}
        print("train_vae recon:", json.dumps(results["train_vae"]))

    with open(os.path.join(ws, "accuracy.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {os.path.join(ws, 'accuracy.json')}")

    if not args.skip_report:
        with open(REPORT) as f:
            report = json.load(f)
        if args.seed:
            # replicate run: record NEXT TO the seed-0 headline numbers
            # (never overwriting them) and refresh the cross-seed aggregate
            import statistics

            acc_meta = report.setdefault("accuracy_meta", {})
            rep = acc_meta.setdefault("replicates", {})
            entry = {}
            if "train_decoder" in results:
                entry["train_decoder_f1_macro"] = \
                    results["train_decoder"]["tag_f1_macro"]
            if "train_full" in results:
                entry["train_full_f1_macro"] = \
                    results["train_full"]["tag_f1_macro"]
            if "train_vae" in results:
                entry["train_vae_psnr_db"] = \
                    results["train_vae"]["psnr_trained_db"]
            rep[f"seed{args.seed}"] = entry
            seed0 = {
                "train_decoder_f1_macro": report.get(
                    "train_decoder_512px_batch4", {}).get(
                    "accuracy", {}).get("tag_f1_macro"),
                "train_full_f1_macro": report.get(
                    "train_full_1024px_batch1_remat", {}).get(
                    "accuracy", {}).get("tag_f1_macro"),
                "train_vae_psnr_db": report.get(
                    "train_vae_256px", {}).get("psnr_trained_db"),
            }
            agg = {}
            for k, v0 in seed0.items():
                vals = ([v0] if v0 is not None else []) + \
                    [r[k] for r in rep.values() if k in r]
                if len(vals) >= 2:
                    agg[k] = {"mean": round(statistics.mean(vals), 4),
                              "std": round(statistics.stdev(vals), 4),
                              "n_seeds": len(vals)}
            if agg:
                acc_meta["seed_mean_std"] = agg
            print("replicate aggregate:", json.dumps(agg))
        else:
            meta = {"dataset": results["dataset"],
                    "wall_s": results.get("wall_s", {}),
                    "note": "trained on-chip accuracy per BASELINE.md's "
                            "plan; 256px = the synthetic fixture's native "
                            "size (converges in minutes); see "
                            "benchmarks/accuracy.py"}
            if "latent_mse_gate" in results:
                meta["latent_mse_gate"] = results["latent_mse_gate"]
            # update in place so replicate fields from prior runs survive
            report.setdefault("accuracy_meta", {}).update(meta)
            report.setdefault("train_decoder_512px_batch4",
                              {})["accuracy"] = results["train_decoder"]
            if "train_full" in results:
                report.setdefault("train_full_1024px_batch1_remat",
                                  {})["accuracy"] = results["train_full"]
                report.setdefault("bucketed_tagging", {})["accuracy"] = \
                    results["batch_inference"]
                report.setdefault("infer_full_e2e_1024px_yuv420",
                                  {})["quality_vs_rgb"] = \
                    results["yuv420_quality"]
            if "train_vae" in results:
                report["train_vae_256px"] = results["train_vae"]
        with open(REPORT, "w") as f:
            json.dump(report, f, indent=2)
        print(f"updated {REPORT}")


if __name__ == "__main__":
    main()
