#!/usr/bin/env python
"""VAE round-trip test — behavior-compatible with the reference
``vae_reconstruction_test.py``: encode -> sample -> decode a real or
procedurally generated image; report MSE, PSNR = 20*log10(2) - 10*log10(MSE),
and the compression ratio; save a 3-panel comparison PNG plus original/
reconstructed images and the latent tensor (both .npy and torch .pt)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vae_tagger_tpu.core.runtime import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

import numpy as np  # noqa: E402


def create_test_image(size=(512, 512)):
    """Procedural gradient + shapes fixture (RGB gradients, white disc,
    red square) — same visual recipe as the reference fixture."""
    from PIL import Image

    width, height = size
    img = np.zeros((height, width, 3), dtype=np.uint8)
    img[:, :, 0] = np.linspace(0, 255, width, dtype=np.uint8)[None, :]
    img[:, :, 1] = np.linspace(255, 0, height, dtype=np.uint8)[:, None]
    img[:, :, 2] = 128
    cy, cx = height // 2, width // 2
    yy, xx = np.ogrid[:height, :width]
    img[(xx - cx) ** 2 + (yy - cy) ** 2 <= (min(size) // 6) ** 2] = [255, 255, 255]
    r = min(size) // 8
    img[cy - r:cy + r, cx - r:cx + r] = [255, 0, 0]
    return Image.fromarray(img)


def main():
    parser = argparse.ArgumentParser(description="VAE reconstruction test")
    parser.add_argument("--vae_checkpoint", type=str, default=None)
    parser.add_argument("--vae_config_path", type=str, default=None)
    parser.add_argument("--image_path", type=str, default=None,
                        help="optional; procedural test image when omitted")
    parser.add_argument("--output_dir", type=str,
                        default="vae_reconstruction_output")
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--show_result", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tiled", action="store_true",
                        help="round-trip at the image's NATIVE resolution "
                             "through fixed-shape overlapping tiles (TPU "
                             "extension; posterior mode instead of a "
                             "sample, HBM bounded by one tile batch)")
    parser.add_argument("--tile_size", type=int, default=1024)
    parser.add_argument("--tile_overlap", type=int, default=256)
    args = parser.parse_args()

    if not args.vae_checkpoint and not args.vae_config_path:
        print("warning: no VAE checkpoint/config given; using a fresh model "
              "with the default config")

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vae_tagger_tpu.infer.engine import load_vae_bundle
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    from vae_tagger_tpu.ops.image import normalize_uint8

    vae, params = load_vae_bundle(args.vae_checkpoint, args.vae_config_path,
                                  resolution=args.resolution)

    if args.image_path and os.path.exists(args.image_path):
        original = Image.open(args.image_path).convert("RGB")
        print(f"loaded image: {args.image_path}")
    else:
        original = create_test_image((args.resolution, args.resolution))
        print("using a generated test image")
    if not args.tiled:
        original = original.resize((args.resolution, args.resolution),
                                   Image.LANCZOS)
    pixels_np = np.asarray(original, np.uint8)

    if args.tiled:
        from vae_tagger_tpu.infer.tiled import TiledVAE
        from vae_tagger_tpu.models.autoencoder_kl import decode_scaled

        print(f"running TILED VAE encode/decode at native "
              f"{pixels_np.shape[1]}x{pixels_np.shape[0]} "
              f"(tile {args.tile_size}, overlap {args.tile_overlap})...")
        tiler = TiledVAE(vae, params, tile=args.tile_size,
                         overlap=args.tile_overlap)
        x = np.asarray(pixels_np, np.float32)[None] / 127.5 - 1.0
        z_scaled = tiler.encode(pixels_np)
        # report the RAW posterior-mode latent like the direct path below
        latent = np.asarray(decode_scaled(z_scaled, vae.config))[None]
        recon = tiler.decode(z_scaled)[None][:, :x.shape[1], :x.shape[2]]
    else:
        pixels = jnp.asarray(pixels_np)[None]

        @jax.jit
        def roundtrip(params, px, rng):
            x = normalize_uint8(px)
            posterior = vae.apply({"params": params}, x,
                                  method=AutoencoderKL.encode)
            z = posterior.sample(rng)
            recon = vae.apply({"params": params}, z,
                              method=AutoencoderKL.decode)
            return x, z, recon

        print("running VAE encode/decode...")
        x, latent, recon = map(np.asarray, jax.device_get(
            roundtrip(params, pixels, jax.random.key(args.seed))))
    print(f"latent shape: {latent.shape}")
    print(f"latent stats: mean={latent.mean():.4f}, std={latent.std():.4f}")

    mse = float(np.mean((x - recon) ** 2))
    psnr = 20 * np.log10(2.0) - 10 * np.log10(mse)
    compression = x.size / latent.size

    recon_img = Image.fromarray(
        (np.clip(recon[0] * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8))

    os.makedirs(args.output_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        axes[0].imshow(original)
        axes[0].set_title("Original Image", fontsize=14)
        axes[1].imshow(recon_img)
        axes[1].set_title(f"VAE reconstruction\nMSE Loss: {mse:.6f}",
                          fontsize=14)
        diff = np.abs(np.asarray(original, float) - np.asarray(recon_img, float))
        axes[2].imshow(diff / diff.max() if diff.max() > 0 else diff)
        axes[2].set_title("difference (abs)", fontsize=14)
        for ax in axes:
            ax.axis("off")
        plt.tight_layout()
        cmp_path = os.path.join(args.output_dir,
                                "vae_reconstruction_comparison.png")
        plt.savefig(cmp_path, dpi=300, bbox_inches="tight")
        print(f"comparison saved to: {cmp_path}")
        if args.show_result:
            plt.show()
    except Exception as e:
        print(f"matplotlib comparison skipped: {e}")

    original.save(os.path.join(args.output_dir, "original.png"))
    recon_img.save(os.path.join(args.output_dir, "reconstructed.png"))
    np.save(os.path.join(args.output_dir, "latent_vector.npy"), latent)
    try:
        import torch

        # torch .pt in the reference's NCHW layout for interchange
        torch.save(torch.from_numpy(latent.transpose(0, 3, 1, 2).copy()),
                   os.path.join(args.output_dir, "latent_vector.pt"))
    except Exception as e:
        print(f"torch latent export skipped: {e}")

    print("VAE reconstruction test complete!")
    print(f"input resolution: {x.shape[2]}x{x.shape[1]}"
          + (" (native, tiled)" if args.tiled else ""))
    print(f"latent shape: {latent.shape}")
    print(f"compression ratio: {compression:.2f}:1")
    print(f"reconstruction MSE: {mse:.6f}")
    print(f"PSNR: {psnr:.2f} dB")


if __name__ == "__main__":
    main()
