"""End-to-end inference tests: engine loading from the compatible checkpoint
formats, batched tagging, JSON output format, latent extraction."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_tagger_tpu.core.config import default_flux_vae_config
from vae_tagger_tpu.infer import TaggerEngine, infer_and_classify
from vae_tagger_tpu.infer.classify import _format_results
from vae_tagger_tpu.infer.latents import (
    VAEOnlyEngine,
    flatten_latent_torch_order,
    infer_and_save_latents,
)
from vae_tagger_tpu.io import save_decoder_bin, save_vae_pretrained
from vae_tagger_tpu.io.safetensors_io import load_vae_pretrained_dir
from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
from vae_tagger_tpu.infer.engine import build_decoder
from vae_tagger_tpu.utils import create_synthetic_dataset

CFG = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                              norm_num_groups=4, latent_channels=16,
                              sample_size=64)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("artifacts")
    ds = create_synthetic_dataset(str(root / "test_dataset"), num_images=6,
                                  img_size=64, seed=0)
    # tiny VAE checkpoint in the diffusers layout
    model = AutoencoderKL(CFG)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jax.random.key(1))["params"]
    vae_dir = str(root / "vae")
    save_vae_pretrained(params, CFG, vae_dir)
    # decoder .bin
    decoder = build_decoder(ds["num_tags"], use_attention=True,
                            latent_channels=16)
    variables = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 16)),
        deterministic=True)
    bin_path = str(root / "decoder.bin")
    save_decoder_bin(variables["params"], variables.get("batch_stats"),
                     bin_path)
    return root, ds, vae_dir, bin_path


def test_engine_load_and_classify(artifacts):
    root, ds, vae_dir, bin_path = artifacts
    engine = TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=bin_path,
        tags_csv_path=ds["tags_csv"],
        vae_config_path=f"{vae_dir}/config.json")
    px = np.zeros((2, 64, 64, 3), dtype=np.uint8)
    probs = engine.classify(px)
    assert probs.shape == (2, ds["num_tags"])
    assert np.all((probs >= 0) & (probs <= 1))
    conf, idx = engine.get_confidence(px)
    assert np.all(np.diff(conf, axis=-1) <= 0)  # descending
    np.testing.assert_allclose(np.take_along_axis(probs, idx, -1), conf)


def test_infer_and_classify_json_format(artifacts, tmp_path):
    root, ds, vae_dir, bin_path = artifacts
    engine = TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=bin_path,
        tags_csv_path=ds["tags_csv"],
        vae_config_path=f"{vae_dir}/config.json")
    results = infer_and_classify(
        engine, ds["images_dir"], output_dir=str(tmp_path), resolution=64,
        confidence_threshold=0.3, batch_size=4, verbose=False)
    assert len(results) == 6
    path = tmp_path / "classification_results.json"
    assert path.exists()
    saved = json.loads(path.read_text())
    entry = next(iter(saved.values()))
    # the reference's output schema (infer_full.py:119-124)
    assert set(entry) == {"predicted_tags", "total_tags_above_threshold",
                          "max_confidence", "avg_confidence_top5"}
    for tag in entry["predicted_tags"]:
        assert set(tag) == {"tag", "confidence"}
        assert tag["confidence"] >= 0.3
    # sorted descending
    confs = [t["confidence"] for t in entry["predicted_tags"]]
    assert confs == sorted(confs, reverse=True)


def test_format_results_values():
    probs = np.array([0.9, 0.1, 0.6, 0.45])
    out = _format_results(["a", "b", "c", "d"], probs, threshold=0.5)
    assert [t["tag"] for t in out["predicted_tags"]] == ["a", "c"]
    assert out["total_tags_above_threshold"] == 2
    assert out["max_confidence"] == 0.9
    # top5 mean with padding semantics: sum of top 4 / 5 (only 4 classes)
    np.testing.assert_allclose(out["avg_confidence_top5"],
                               round((0.9 + 0.6 + 0.45 + 0.1) / 5, 4))


def test_latents_json_and_flatten_order(artifacts, tmp_path):
    root, ds, vae_dir, bin_path = artifacts
    engine = VAEOnlyEngine(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        vae_config_path=f"{vae_dir}/config.json")
    data = infer_and_save_latents(engine, ds["images_dir"],
                                  output_dir=str(tmp_path), resolution=64,
                                  batch_size=4, verbose=False)
    assert len(data) == 6
    vec = next(iter(data.values()))
    assert len(vec) == 16 * 8 * 8
    # flatten order: channel-major (torch NCHW flatten)
    z = np.arange(2 * 3 * 4).reshape(2, 3, 4).transpose(1, 2, 0)  # (3,4,2) hwc
    flat = flatten_latent_torch_order(z)
    np.testing.assert_array_equal(flat, np.arange(24))

    # npz extension: same values, binary container keyed by image path
    data_npz = infer_and_save_latents(engine, ds["images_dir"],
                                      output_dir=str(tmp_path / "npz"),
                                      resolution=64, batch_size=4,
                                      verbose=False, output_format="npz")
    loaded = np.load(tmp_path / "npz" / "latent_vectors.npz")
    assert set(loaded.files) == set(data.keys())
    for path, vec in data.items():
        np.testing.assert_allclose(loaded[path],
                                   np.asarray(vec, np.float32), rtol=0)
    with pytest.raises(ValueError, match="output_format"):
        infer_and_save_latents(engine, ds["images_dir"],
                               output_dir=str(tmp_path),
                               resolution=64, output_format="parquet")


def test_latents_yuv_transfer(artifacts, tmp_path):
    """VAEOnlyEngine (the infer_vae.py CLI engine) supports the YUV 4:2:0
    wire format; extraction matches the RGB path's keys and shapes and the
    vectors agree to chroma-resample noise."""
    root, ds, vae_dir, bin_path = artifacts
    engine = VAEOnlyEngine(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        vae_config_path=f"{vae_dir}/config.json")
    rgb = infer_and_save_latents(engine, ds["images_dir"],
                                 output_dir=str(tmp_path / "rgb"),
                                 resolution=64, batch_size=4, verbose=False,
                                 output_format="npz")
    yuv = infer_and_save_latents(engine, ds["images_dir"],
                                 output_dir=str(tmp_path / "yuv"),
                                 resolution=64, batch_size=4, verbose=False,
                                 output_format="npz",
                                 transfer_format="yuv420")
    assert set(rgb) == set(yuv) and len(rgb) == 6
    # exact oracle: the YUV wire path must equal encoding the
    # device-converted RGB of the SAME planes (the 4:2:0 loss happens on
    # the host; the device side is deterministic)
    from vae_tagger_tpu.data.bucketing import load_and_transform_image_yuv
    from vae_tagger_tpu.infer.latents import flatten_latent_torch_order
    from vae_tagger_tpu.ops.image import yuv420_to_rgb_uint8
    for k in yuv:
        b = np.asarray(yuv[k], np.float32)
        assert b.shape == (16 * 8 * 8,)
        y, cbcr = load_and_transform_image_yuv(k, resolution=64)
        conv = np.asarray(yuv420_to_rgb_uint8(jnp.asarray(y[None]),
                                              jnp.asarray(cbcr[None])))
        expect = flatten_latent_torch_order(
            np.asarray(engine.encode(conv)[0], np.float32))
        np.testing.assert_allclose(b, expect, rtol=2e-5, atol=2e-5)


def test_standalone_evaluate_checkpoint(artifacts, tmp_path):
    """scripts/evaluate.py path: score exported artifacts on a labeled
    dataset without a training run (the reference cannot do this)."""
    import argparse

    from vae_tagger_tpu.eval.standalone import evaluate_checkpoint

    root, ds, vae_dir, bin_path = artifacts
    args = argparse.Namespace(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        vae_config_path=f"{vae_dir}/config.json",
        decoder_checkpoint=bin_path,
        json_path=ds["data_json"],
        tags_csv_path=ds["tags_csv"],
        output_dir=str(tmp_path),
        resolution=64,
        batch_size=4,
        num_workers=2,
        prefetch_factor=2,
        seed=42,
        threshold=None,
        use_val_split=False,
        use_attention=True,
    )
    metrics = evaluate_checkpoint(args)
    assert 0.0 <= metrics["f1_macro"] <= 1.0
    assert 0.1 <= metrics["threshold"] <= 0.9  # searched
    assert (tmp_path / "optimal_thresholds.json").exists()
    assert (tmp_path / "evaluation_results.csv").exists()
    assert (tmp_path / "evaluation_results_overall.json").exists()

    # fixed threshold skips the search; val split scores the 10% subset
    args.threshold = 0.5
    args.use_val_split = True
    args.output_dir = str(tmp_path / "fixed")
    m2 = evaluate_checkpoint(args)
    assert m2["threshold"] == 0.5
    assert not (tmp_path / "fixed" / "optimal_thresholds.json").exists()


def test_engine_serves_sd_family_vae(tmp_path):
    """The whole engine path (config -> quant-conv VAE -> 4-ch latents ->
    tagger head sized from the config) works for the SD VAE family."""
    from vae_tagger_tpu.core.config import default_sd_vae_config

    cfg = default_sd_vae_config(block_out_channels=(8, 16, 16, 16),
                                norm_num_groups=4, sample_size=64)
    model = AutoencoderKL(cfg)
    params = jax.jit(model.init)({"params": jax.random.key(0)},
                                 jnp.zeros((1, 64, 64, 3)),
                                 jax.random.key(1))["params"]
    vae_dir = str(tmp_path / "sd_vae")
    save_vae_pretrained(params, cfg, vae_dir)

    # 4-ch latents compress to 2 channels: 8 heads cannot divide them (the
    # reference's torch MultiheadAttention has the same constraint), so SD
    # taggers use num_heads=2 (or the plain head)
    decoder = build_decoder(5, use_attention=True, latent_channels=4,
                            attention_config={"attention_heads": 2})
    variables = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 4)),
        deterministic=True)
    bin_path = str(tmp_path / "decoder.bin")
    save_decoder_bin(variables["params"], variables.get("batch_stats"),
                     bin_path)
    csv_path = str(tmp_path / "tags.csv")
    with open(csv_path, "w") as f:
        f.write("name\n" + "\n".join(f"t{i}" for i in range(5)))

    engine = TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=bin_path,
        tags_csv_path=csv_path,
        vae_config_path=f"{vae_dir}/config.json",
        attention_config={"attention_heads": 2})
    px = np.zeros((2, 64, 64, 3), dtype=np.uint8)
    latents = engine.encode(px)
    assert latents.shape == (2, 8, 8, 4)  # 4-ch SD latents, scaled/shifted
    probs = engine.classify(px)
    assert probs.shape == (2, 5)
    assert np.all(np.isfinite(probs))


def test_dump_attention_maps(artifacts, tmp_path):
    """scripts/attention_maps.py surface: NPZ maps + PNG overlays + index
    for every image (the reference stubs get_attention_maps out entirely,
    /root/reference/modules.py:477-485)."""
    from PIL import Image

    from vae_tagger_tpu.infer.attention_viz import dump_attention_maps

    root, ds, vae_dir, bin_path = artifacts
    engine = TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=bin_path,
        tags_csv_path=ds["tags_csv"],
        vae_config_path=f"{vae_dir}/config.json")
    out = str(tmp_path / "attn")
    index = dump_attention_maps(engine, str(root / "test_dataset" / "images"),
                                out, resolution=64, batch_size=4,
                                max_images=5)
    assert len(index["images"]) == 5
    for entry in index["images"].values():
        data = np.load(f"{out}/{entry['npz']}")
        # 64px -> 8x8 latent grid through the f8 VAE
        assert data["spatial_attention"].shape == (8, 8, 1)
        assert data["self_attention"].shape[-2:] == (64, 64)  # S = 8*8
        assert 0.0 <= float(data["spatial_attention"].min())
        assert float(data["spatial_attention"].max()) <= 1.0
        # softmax rows sum to 1 (fp16 storage tolerance)
        rows = data["self_attention"].astype(np.float32).sum(-1)
        np.testing.assert_allclose(rows, 1.0, atol=2e-2)
        img = Image.open(f"{out}/{entry['spatial_overlay']}")
        assert img.size == (64, 64)
        assert "mhsa_overlay" in entry


def test_dump_attention_maps_duplicate_basenames(artifacts, tmp_path):
    """Recursive discovery can surface a/x.png and b/x.png; artifacts must
    not overwrite each other (round-4 review finding)."""
    import os
    import shutil

    from vae_tagger_tpu.infer.attention_viz import dump_attention_maps

    root, ds, vae_dir, bin_path = artifacts
    engine = TaggerEngine.load(
        vae_checkpoint=f"{vae_dir}/diffusion_pytorch_model.safetensors",
        decoder_checkpoint=bin_path,
        tags_csv_path=ds["tags_csv"],
        vae_config_path=f"{vae_dir}/config.json")
    src = sorted((root / "test_dataset" / "images").iterdir())[0]
    for sub in ("a", "b"):
        (tmp_path / "imgs" / sub).mkdir(parents=True)
        shutil.copy(src, tmp_path / "imgs" / sub / "same.png")
    out = str(tmp_path / "attn")
    index = dump_attention_maps(engine, str(tmp_path / "imgs"), out,
                                resolution=64, batch_size=4)
    assert len(index["images"]) == 2
    npzs = {e["npz"] for e in index["images"].values()}
    assert len(npzs) == 2, "duplicate basenames overwrote each other"
    for e in index["images"].values():
        assert os.path.exists(f"{out}/{e['npz']}")
