"""YUV 4:2:0 transfer-path tests.

The YUV path halves host->device transfer bytes (1.5 B/px planar vs RGB's
3 B/px) and moves chroma upsampling + color conversion onto the device
(ops/image.py::yuv420_to_normalized_rgb).  These tests pin:

- the device op against a pure-numpy oracle;
- the native RGB->YUV420 converter against the numpy reference;
- the native JPEG YCbCr decode path against the RGB decode path (the two
  differ only by chroma-resample order, so the reconstituted pixels must
  stay within a small tolerance);
- end-to-end: infer_and_classify over a mixed directory produces the same
  tags with ``transfer_format='yuv420'`` as with RGB.
"""

import io
import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from vae_tagger_tpu.ops.image import (  # noqa: E402
    normalize_uint8,
    rgb_to_yuv420_reference,
    yuv420_to_normalized_rgb,
)


def _photo(h=64, w=64, seed=0):
    """A smooth 'photographic' test image (chroma subsampling is only a
    faithful representation for band-limited chroma, like real photos)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        128 + 100 * np.sin(xx / 9.0) * np.cos(yy / 13.0),
        128 + 90 * np.cos(xx / 17.0 + 1.0),
        128 + 80 * np.sin((xx + yy) / 11.0),
    ], axis=-1)
    noise = rng.normal(0, 3, size=(h, w, 3)).astype(np.float32)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _upsample2_numpy(p):
    """Bilinear 2x with half-pixel centers (the device op's convention)."""
    h, w = p.shape
    out = np.empty((2 * h, 2 * w), np.float32)
    coords = (np.arange(2 * h) + 0.5) / 2.0 - 0.5
    i0 = np.clip(np.floor(coords).astype(int), 0, h - 1)
    i1 = np.clip(i0 + 1, 0, h - 1)
    fy = np.clip(coords - np.floor(coords), 0, 1)
    fy = np.where(coords < 0, 0.0, np.where(coords > h - 1, 1.0, fy))
    cj = (np.arange(2 * w) + 0.5) / 2.0 - 0.5
    j0 = np.clip(np.floor(cj).astype(int), 0, w - 1)
    j1 = np.clip(j0 + 1, 0, w - 1)
    fx = np.clip(cj - np.floor(cj), 0, 1)
    fx = np.where(cj < 0, 0.0, np.where(cj > w - 1, 1.0, fx))
    top = p[i0][:, j0] * (1 - fx) + p[i0][:, j1] * fx
    bot = p[i1][:, j0] * (1 - fx) + p[i1][:, j1] * fx
    out = top * (1 - fy[:, None]) + bot * fy[:, None]
    return out


def test_device_op_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (2, 16, 24), dtype=np.uint8)
    cbcr = rng.integers(0, 256, (2, 2, 8, 12), dtype=np.uint8)
    got = np.asarray(yuv420_to_normalized_rgb(jnp.asarray(y),
                                              jnp.asarray(cbcr)))
    for b in range(2):
        cb = _upsample2_numpy(cbcr[b, 0].astype(np.float32)) - 128.0
        cr = _upsample2_numpy(cbcr[b, 1].astype(np.float32)) - 128.0
        yf = y[b].astype(np.float32)
        rgb = np.stack([yf + 1.402 * cr,
                        yf - 0.344136 * cb - 0.714136 * cr,
                        yf + 1.772 * cb], axis=-1)
        want = np.clip(np.round(rgb), 0, 255) / 127.5 - 1.0
        np.testing.assert_allclose(got[b], want, atol=1.5e-2)


def test_rgb_roundtrip_close_on_smooth_content():
    img = _photo()
    y, cbcr = rgb_to_yuv420_reference(img)
    assert y.shape == (64, 64) and cbcr.shape == (2, 32, 32)
    back = np.asarray(yuv420_to_normalized_rgb(
        jnp.asarray(y[None]), jnp.asarray(cbcr[None])))[0]
    direct = np.asarray(normalize_uint8(jnp.asarray(img[None])))[0]
    # 4:2:0 loses chroma bandwidth; on smooth content the reconstruction
    # stays within a few uint8 levels of the direct RGB path
    assert np.abs(back - direct).mean() < 4.0 / 127.5
    assert np.abs(back - direct).max() < 40.0 / 127.5


def test_native_rgb_to_yuv420_matches_reference():
    native = pytest.importorskip("vae_tagger_tpu.native")
    if not native.available() or not hasattr(native, "rgb_to_yuv420"):
        pytest.skip("native rgb_to_yuv420 unavailable")
    img = _photo(48, 80, seed=3)
    y_ref, cbcr_ref = rgb_to_yuv420_reference(img)
    y, cbcr = native.rgb_to_yuv420(img)
    # float order-of-operations may differ by the final rounding ULP
    assert np.abs(y.astype(int) - y_ref.astype(int)).max() <= 1
    assert np.abs(cbcr.astype(int) - cbcr_ref.astype(int)).max() <= 1


def _jpeg_bytes(img, subsampling=2, quality=92):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality,
                              subsampling=subsampling)
    return buf.getvalue()


def test_native_jpeg_yuv_decode_tracks_rgb_decode():
    native = pytest.importorskip("vae_tagger_tpu.native")
    if not native.decode_available("jpeg") or \
            not hasattr(native, "decode_jpeg_resize_yuv420"):
        pytest.skip("native YUV JPEG decode unavailable")
    img = _photo(120, 160, seed=5)
    data = _jpeg_bytes(img)
    rgb = native.decode_jpeg_resize(data, 64, 64, "distort",
                                    quality_factor=0, resample="bilinear")
    out = native.decode_jpeg_resize_yuv420(data, 64, 64, "distort",
                                           quality_factor=0,
                                           resample="bilinear")
    assert out is not None
    y, cbcr = out
    assert y.shape == (64, 64) and cbcr.shape == (2, 32, 32)
    back = np.asarray(yuv420_to_normalized_rgb(
        jnp.asarray(y[None]), jnp.asarray(cbcr[None])))[0]
    direct = np.asarray(normalize_uint8(jnp.asarray(rgb[None])))[0]
    # same decoded YCbCr source; differ only in where the chroma resample
    # happens (host full-res vs host half-res + device upsample)
    assert np.abs(back - direct).mean() < 4.0 / 127.5


def _webp_bytes(img, lossless=False, quality=92):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="WEBP", lossless=lossless,
                              quality=quality)
    return buf.getvalue()


def test_native_webp_yuv_decode_tracks_rgb_decode():
    """Lossy WebP decodes straight to its coded VP8 planes (limited-range
    BT.601, range-expanded in C); the reconstituted RGB must track the RGB
    decode path (same coded data, chroma handled host-side vs device-side)."""
    native = pytest.importorskip("vae_tagger_tpu.native")
    if not native.decode_available("webp") or \
            not hasattr(native, "decode_webp_resize_yuv420"):
        pytest.skip("native YUV WebP decode unavailable")
    img = _photo(120, 160, seed=6)
    data = _webp_bytes(img)
    rgb = native.decode_webp_resize(data, 64, 64, "distort",
                                    resample="bilinear")
    out = native.decode_webp_resize_yuv420(data, 64, 64, "distort",
                                           resample="bilinear")
    assert out is not None
    y, cbcr = out
    assert y.shape == (64, 64) and cbcr.shape == (2, 32, 32)
    back = np.asarray(yuv420_to_normalized_rgb(
        jnp.asarray(y[None]), jnp.asarray(cbcr[None])))[0]
    direct = np.asarray(normalize_uint8(jnp.asarray(rgb[None])))[0]
    assert np.abs(back - direct).mean() < 4.0 / 127.5


def test_native_webp_lossless_falls_back_to_rgb_path():
    """Lossless WebP is RGB-coded: the YUV fast path declines (None) and the
    generic dispatcher converts the native RGB decode instead — exactly."""
    native = pytest.importorskip("vae_tagger_tpu.native")
    if not native.decode_available("webp") or \
            not hasattr(native, "decode_webp_resize_yuv420"):
        pytest.skip("native YUV WebP decode unavailable")
    img = _photo(96, 96, seed=8)
    data = _webp_bytes(img, lossless=True)
    assert native.decode_webp_resize_yuv420(data, 64, 64) is None
    out = native.decode_image_resize_yuv420(data, 64, 64)
    assert out is not None
    y, cbcr = out
    rgb = native.decode_image_resize(data, 64, 64)
    y_ref, cbcr_ref = native.rgb_to_yuv420(rgb)
    np.testing.assert_array_equal(y, y_ref)
    np.testing.assert_array_equal(cbcr, cbcr_ref)


def test_native_grayscale_jpeg_yuv():
    native = pytest.importorskip("vae_tagger_tpu.native")
    if not native.decode_available("jpeg") or \
            not hasattr(native, "decode_jpeg_resize_yuv420"):
        pytest.skip("native YUV JPEG decode unavailable")
    from PIL import Image

    gray = (_photo(100, 100, seed=7)[..., 0]).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, format="JPEG", quality=95)
    out = native.decode_jpeg_resize_yuv420(buf.getvalue(), 64, 64, "distort",
                                           quality_factor=0,
                                           resample="bilinear")
    assert out is not None
    y, cbcr = out
    # grayscale JPEG: neutral chroma
    assert (cbcr == 128).all()
    rgb = native.decode_jpeg_resize(buf.getvalue(), 64, 64, "distort",
                                    quality_factor=0, resample="bilinear")
    assert np.abs(y.astype(int) - rgb[..., 0].astype(int)).max() <= 1


def _tiny_engine(num_tags=5):
    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.infer.engine import TaggerEngine, build_decoder
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL

    cfg = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                                  norm_num_groups=4, latent_channels=16,
                                  sample_size=64)
    vae = AutoencoderKL(cfg)
    params = jax.jit(vae.init)({"params": jax.random.key(0)},
                               jnp.zeros((1, 64, 64, 3)),
                               jax.random.key(1))["params"]
    decoder = build_decoder(num_tags, use_attention=True, latent_channels=16)
    variables = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 8, 8, 16)),
        deterministic=True)
    return TaggerEngine(vae=vae, vae_params=params, decoder=decoder,
                        decoder_variables=dict(variables),
                        tag_names=[f"t{i}" for i in range(num_tags)])


def test_loader_yuv_batches_and_classify_parity(tmp_path):
    """End-to-end: the YUV transfer format tags a mixed JPEG/PNG directory
    like the RGB path does (probabilities within chroma-resample noise)."""
    from PIL import Image

    from vae_tagger_tpu.infer.classify import infer_and_classify

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        img = _photo(96, 128, seed=10 + i)
        Image.fromarray(img).save(d / f"im{i}.jpg", quality=95)
    Image.fromarray(_photo(80, 80, seed=20)).save(d / "im3.png")

    engine = _tiny_engine()
    out_rgb = infer_and_classify(engine, str(d), str(tmp_path / "o_rgb"),
                                 resolution=64, batch_size=2,
                                 confidence_threshold=0.0, verbose=False)
    out_yuv = infer_and_classify(engine, str(d), str(tmp_path / "o_yuv"),
                                 resolution=64, batch_size=2,
                                 confidence_threshold=0.0, verbose=False,
                                 transfer_format="yuv420")
    assert set(out_rgb) == set(out_yuv) and len(out_rgb) == 4
    for k in out_rgb:
        a = {t["tag"]: t["confidence"] for t in out_rgb[k]["predicted_tags"]}
        b = {t["tag"]: t["confidence"] for t in out_yuv[k]["predicted_tags"]}
        assert set(a) == set(b)
        for tag in a:
            assert abs(a[tag] - b[tag]) < 0.05
    # the written artifact parses and has the reference schema
    res = json.loads((tmp_path / "o_yuv" /
                      "classification_results.json").read_text())
    for v in res.values():
        assert {"predicted_tags", "total_tags_above_threshold",
                "max_confidence", "avg_confidence_top5"} <= set(v)


def test_engine_encode_yuv_matches_converted_rgb():
    """encode_yuv_async == encode() fed the device-converted RGB pixels —
    the wire format changes bytes on the wire, not the encoded latents."""
    from vae_tagger_tpu.ops.image import yuv420_to_rgb_uint8

    engine = _tiny_engine()
    planes = [rgb_to_yuv420_reference(_photo(64, 64, seed=40 + i))
              for i in range(2)]
    y = np.stack([p[0] for p in planes])
    cbcr = np.stack([p[1] for p in planes])
    rgb = np.asarray(yuv420_to_rgb_uint8(jnp.asarray(y), jnp.asarray(cbcr)))

    lat_dev, b = engine.encode_yuv_async(y, cbcr)
    lat_yuv = np.asarray(lat_dev)[:b]
    lat_rgb = engine.encode(rgb)
    np.testing.assert_allclose(lat_yuv, lat_rgb, rtol=2e-6, atol=2e-6)


def test_latent_extraction_yuv_e2e(tmp_path):
    """infer_and_save_latents --transfer_format yuv420: same image keys,
    latents within chroma-resample noise of the RGB wire path."""
    from PIL import Image

    from vae_tagger_tpu.infer.latents import infer_and_save_latents

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        Image.fromarray(_photo(96, 128, seed=50 + i)).save(
            d / f"im{i}.jpg", quality=95)

    engine = _tiny_engine()
    rgb = infer_and_save_latents(engine, str(d), str(tmp_path / "o_rgb"),
                                 resolution=64, batch_size=2, verbose=False,
                                 output_format="npz")
    yuv = infer_and_save_latents(engine, str(d), str(tmp_path / "o_yuv"),
                                 resolution=64, batch_size=2, verbose=False,
                                 output_format="npz",
                                 transfer_format="yuv420")
    assert set(rgb) == set(yuv) and len(rgb) == 3
    for k in rgb:
        a = np.asarray(rgb[k], np.float32)
        b = np.asarray(yuv[k], np.float32)
        assert a.shape == b.shape
        # 4:2:0 chroma subsampling perturbs the input slightly; latents of
        # the tiny random VAE stay close in an rms sense
        rms = float(np.sqrt(np.mean((a - b) ** 2)))
        scale = float(np.sqrt(np.mean(a ** 2))) + 1e-6
        assert rms / scale < 0.15, (rms, scale)
    assert (tmp_path / "o_yuv" / "latent_vectors.npz").exists()


def test_yuv_requires_even_resolution():
    from vae_tagger_tpu.data.bucketing import load_and_transform_image_yuv

    with pytest.raises(ValueError):
        load_and_transform_image_yuv("nonexistent.jpg", resolution=33)


# --------------------------------------------------------------------------
# training-path YUV transfer (--transfer_format yuv420 on the trainers)
# --------------------------------------------------------------------------

def _yuv_triplet_batches(b=2, h=32, w=32, num_classes=8, seed=0):
    """(yuv_batch, rgb_batch) where the RGB member images are EXACTLY the
    device-reconstituted YUV ones — so a train step must produce identical
    results through either wire format."""
    from vae_tagger_tpu.ops.image import yuv420_to_rgb_uint8

    rng = np.random.default_rng(seed)
    labels = (rng.random((b, num_classes)) > 0.5).astype(np.float32)
    yuv = {"labels": jnp.asarray(labels),
           "positive_labels": jnp.asarray(labels)}
    rgb = dict(yuv)
    for i, key in enumerate(("anchor", "positive", "negative")):
        planes = [rgb_to_yuv420_reference(_photo(h, w, seed=seed + 3 * i + j))
                  for j in range(b)]
        yuv[key + "_y"] = jnp.asarray(np.stack([p[0] for p in planes]))
        yuv[key + "_cbcr"] = jnp.asarray(np.stack([p[1] for p in planes]))
        rgb[key] = yuv420_to_rgb_uint8(yuv[key + "_y"], yuv[key + "_cbcr"])
    return yuv, rgb


def test_full_train_step_yuv_equals_device_converted_rgb():
    """make_full_steps through a YUV wire batch == the RGB path fed the
    device-converted pixels (resolve_transfer_format is exact, not lossy —
    the 4:2:0 loss happened on the host side)."""
    import optax

    from vae_tagger_tpu.core.config import default_flux_vae_config
    from vae_tagger_tpu.infer.engine import build_decoder
    from vae_tagger_tpu.losses.combined import LossConfig
    from vae_tagger_tpu.models.autoencoder_kl import AutoencoderKL
    from vae_tagger_tpu.train.state import TrainState, build_optimizer
    from vae_tagger_tpu.train.steps import make_full_steps

    cfg = default_flux_vae_config(block_out_channels=(8, 16, 16, 16),
                                  norm_num_groups=4, latent_channels=16,
                                  sample_size=32)
    vae = AutoencoderKL(cfg)
    vae_params = jax.jit(vae.init)({"params": jax.random.key(0)},
                                   jnp.zeros((1, 32, 32, 3)),
                                   jax.random.key(1))["params"]
    decoder = build_decoder(8, use_attention=True, latent_channels=16)
    dec_vars = jax.jit(decoder.init, static_argnames=("deterministic",))(
        {"params": jax.random.key(2)}, jnp.zeros((1, 4, 4, 16)),
        deterministic=True)
    tx = build_optimizer(optax.constant_schedule(1e-3), 1e-6, 1.0, 1)
    train_step, eval_step = make_full_steps(
        vae, decoder, LossConfig(use_focal_loss=True), use_simplified=True)

    yuv_batch, rgb_batch = _yuv_triplet_batches()

    def fresh():
        fresh_vars = jax.tree.map(jnp.array, dec_vars)
        return TrainState.create(
            {"vae": jax.tree.map(jnp.array, vae_params),
             "decoder": fresh_vars["params"]},
            tx, batch_stats=fresh_vars.get("batch_stats"))

    s_yuv, m_yuv = train_step(fresh(), yuv_batch, jax.random.key(7))
    s_rgb, m_rgb = train_step(fresh(), rgb_batch, jax.random.key(7))
    np.testing.assert_allclose(float(m_yuv["loss"]), float(m_rgb["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7),
        s_yuv.params, s_rgb.params)
    # eval side too
    e_yuv = eval_step(s_yuv, yuv_batch, jax.random.key(9))
    e_rgb = eval_step(s_rgb, rgb_batch, jax.random.key(9))
    np.testing.assert_allclose(np.asarray(e_yuv["probs"]),
                               np.asarray(e_rgb["probs"]), atol=1e-5)


def test_dataset_yuv_items_match_rgb_items(tmp_path):
    """transfer_format='yuv420' items carry <key>_y/<key>_cbcr planes that
    are exactly to_yuv420() of the RGB items (same transform, same mining)."""
    from PIL import Image

    from vae_tagger_tpu.data.bucketing import to_yuv420
    from vae_tagger_tpu.data.dataset import TaggedImageDataset
    from vae_tagger_tpu.data.loader import DataLoader

    d = tmp_path / "imgs"
    d.mkdir()
    data = {}
    for i in range(4):
        p = str(d / f"im{i}.png")
        Image.fromarray(_photo(48, 48, seed=i)).save(p)
        data[p] = f"t{i % 2}:1.0, t2:0.8"
    (tmp_path / "data.json").write_text(json.dumps(data))
    (tmp_path / "tags.csv").write_text("name\nt0\nt1\nt2\n")

    kw = dict(json_path=str(tmp_path / "data.json"),
              tags_csv_path=str(tmp_path / "tags.csv"),
              resolution=32, return_triplets=True, seed=3)
    ds_rgb = TaggedImageDataset(**kw)
    ds_yuv = TaggedImageDataset(transfer_format="yuv420", **kw)
    item_rgb, item_yuv = ds_rgb[1], ds_yuv[1]
    for key in ("anchor", "positive", "negative"):
        y, cbcr = to_yuv420(item_rgb[key])
        np.testing.assert_array_equal(item_yuv[key + "_y"], y)
        np.testing.assert_array_equal(item_yuv[key + "_cbcr"], cbcr)
        assert item_yuv[key + "_y"].shape == (32, 32)
        assert item_yuv[key + "_cbcr"].shape == (2, 16, 16)
        assert key not in item_yuv
    np.testing.assert_array_equal(item_yuv["labels"], item_rgb["labels"])

    # loader collates the planar keys into (B, ...) batches
    batch = next(iter(DataLoader(ds_yuv, 2, shuffle=False, num_workers=1)))
    assert batch["anchor_y"].shape == (2, 32, 32)
    assert batch["anchor_cbcr"].shape == (2, 2, 16, 16)
    assert batch["anchor_y"].dtype == np.uint8

    # odd dims are rejected up front
    with pytest.raises(ValueError):
        TaggedImageDataset(transfer_format="yuv420",
                           **{**kw, "resolution": 33})


def test_yuv_output_perturbation_bounded():
    """The YUV 4:2:0 wire format's entire numeric effect is the chroma
    subsample; this pins the resulting OUTPUT perturbation (probability
    delta through encode+classify) to the noise floor measured on the
    trained model (benchmarks/accuracy.py, report.json
    infer_full_e2e_1024px_yuv420.quality_vs_rgb: mean logit delta 0.009,
    4/360 prediction flips, macro-F1 delta +0.008)."""
    from vae_tagger_tpu.data.bucketing import (
        decode_bytes_square,
        decode_bytes_square_yuv,
    )

    import io

    from PIL import Image

    engine = _tiny_engine()
    payloads = []
    for i in range(4):
        buf = io.BytesIO()
        Image.fromarray(_photo(96, 112, seed=60 + i)).save(
            buf, "JPEG", quality=92)
        payloads.append(buf.getvalue())

    rgb = np.stack([decode_bytes_square(p, 64) for p in payloads])
    planes = [decode_bytes_square_yuv(p, 64) for p in payloads]
    y = np.stack([p[0] for p in planes])
    cbcr = np.stack([p[1] for p in planes])

    probs_rgb = np.asarray(engine.classify(rgb))
    probs_dev, n = engine.classify_yuv_async(y, cbcr)
    probs_yuv = np.asarray(probs_dev)[:n]

    delta = np.abs(probs_rgb - probs_yuv)
    assert float(delta.mean()) < 0.02, delta.mean()
    assert float(delta.max()) < 0.10, delta.max()
