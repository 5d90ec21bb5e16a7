"""Native C++ resize library: PIL parity and loader integration."""

import numpy as np
import pytest
from PIL import Image

from vae_tagger_tpu import native
from vae_tagger_tpu.data.bucketing import SmartResize

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _smooth_image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    img = np.cumsum(np.cumsum(rng.normal(size=(h, w, 3)), 0), 1)
    img = (img - img.min()) / (img.max() - img.min())
    return (img * 255).astype(np.uint8)


@pytest.mark.parametrize("src_hw,dst_wh", [
    ((600, 800), (256, 192)),   # landscape -> crop width
    ((800, 600), (192, 256)),   # portrait -> crop height
    ((512, 512), (128, 128)),   # same aspect, pure downscale
    ((100, 100), (256, 256)),   # upscale
])
def test_matches_pil_lanczos(src_hw, dst_wh):
    src = _smooth_image(*src_hw)
    dst_w, dst_h = dst_wh
    out_native = native.smart_resize(src, dst_w, dst_h)
    out_pil = np.asarray(SmartResize(dst_w, dst_h)(Image.fromarray(src)))
    diff = np.abs(out_native.astype(int) - out_pil.astype(int))
    # independent Lanczos implementations; agree to rounding on smooth data
    assert diff.max() <= 3, diff.max()
    assert diff.mean() < 0.5, diff.mean()


def test_crop_window_semantics():
    """Center crop must use the middle of the image: paint the left half
    black and the right half white, target square from a 2:1 image."""
    src = np.zeros((100, 200, 3), dtype=np.uint8)
    src[:, 100:] = 255
    out = native.smart_resize(src, 50, 50)  # crops the central 100x100
    # central window spans x=[50,150): half black, half white
    assert out[:, :20].mean() < 10
    assert out[:, 30:].mean() > 245


def test_loader_uses_native_in_bucket_mode(tmp_path):
    from vae_tagger_tpu.data.bucketing import load_and_transform_image

    src = _smooth_image(300, 400)
    p = tmp_path / "img.png"
    Image.fromarray(src).save(p)
    out = load_and_transform_image(str(p), bucket=(128, 64))
    assert out.shape == (64, 128, 3)
    assert out.dtype == np.uint8
    # matches the PIL SmartResize reference pipeline
    ref = np.asarray(SmartResize(128, 64)(Image.fromarray(src)))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 3


# ---------------------------------------------------------------------------
# JPEG decode path (native/decode.cpp)
# ---------------------------------------------------------------------------

decode_needed = pytest.mark.skipif(
    not native.decode_available(),
    reason="native jpeg decoder unavailable (no libjpeg at build time)")


def _jpeg_bytes(h, w, quality=92):
    import io

    buf = io.BytesIO()
    Image.fromarray(_smooth_image(h, w)).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@decode_needed
def test_jpeg_info():
    data = _jpeg_bytes(123, 457)
    assert native.jpeg_info(data) == (123, 457)


@decode_needed
def test_decode_full_scale_matches_pil_decode_exactly():
    """quality_factor=0 forces a full decode: same libjpeg, same DCT method
    as PIL -> byte-identical to PIL-decode + native-resize."""
    import io

    data = _jpeg_bytes(300, 200)
    out = native.decode_jpeg_resize(data, 128, 128, "center", (0, 0),
                                    quality_factor=0)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ref = native.smart_resize(pil, 128, 128, "center")
    assert np.array_equal(out, ref)


@decode_needed
def test_decode_dct_scaled_close_to_reference():
    """With DCT scaling engaged (large source, small target) the result
    stays close to the full-decode reference on smooth data."""
    import io

    data = _jpeg_bytes(1600, 1200)
    out = native.decode_jpeg_resize(data, 128, 128, "center", (0, 0),
                                    quality_factor=2)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    ref = native.smart_resize(pil, 128, 128, "center")
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 12, diff.max()
    assert diff.mean() < 1.0, diff.mean()


@decode_needed
def test_decode_rejects_non_jpeg():
    with pytest.raises(RuntimeError):
        native.decode_jpeg_resize(b"\x89PNG\r\n\x1a\nnotajpeg", 64, 64)


@decode_needed
def test_loader_one_call_jpeg_path(tmp_path):
    """Bucket-mode loading of a large JPEG goes through the one-call native
    decode and stays close to the pure-PIL pipeline."""
    from vae_tagger_tpu.data.bucketing import load_and_transform_image

    src = _smooth_image(1600, 1200)
    p = tmp_path / "big.jpg"
    Image.fromarray(src).save(p, quality=92)
    out = load_and_transform_image(str(p), bucket=(128, 128))
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8
    img = Image.open(p).convert("RGB")
    ref = np.asarray(SmartResize(128, 128)(img))
    assert np.abs(out.astype(int) - ref.astype(int)).mean() < 1.5


# ---------------------------------------------------------------------------
# PNG / WebP decode paths + filter selection (round 3)
# ---------------------------------------------------------------------------

png_needed = pytest.mark.skipif(not native.decode_available("png"),
                                reason="native png decoder unavailable")
webp_needed = pytest.mark.skipif(not native.decode_available("webp"),
                                 reason="native webp decoder unavailable")


def _encoded(fmt, img, **kw):
    import io

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, fmt, **kw)
    return buf.getvalue()


@png_needed
def test_png_decode_matches_pil_decode_exactly():
    """libpng and PIL produce identical RGB pixels; the fused call therefore
    equals PIL-decode + native-resize byte for byte."""
    data = _encoded("PNG", _smooth_image(300, 400))
    assert native.image_info(data) == (300, 400)
    out = native.decode_png_resize(data, 128, 96)
    pil = np.asarray(Image.open(__import__("io").BytesIO(data)).convert("RGB"))
    assert np.array_equal(out, native.smart_resize(pil, 128, 96))


@png_needed
def test_png_alpha_is_dropped_not_composited():
    """PIL convert("RGB") drops the alpha band; the native path must match
    even for translucent pixels."""
    import io

    rng = np.random.default_rng(3)
    rgba = np.dstack([_smooth_image(120, 160, seed=3),
                      rng.integers(0, 256, (120, 160), dtype=np.uint8)])
    buf = io.BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, "PNG")
    data = buf.getvalue()
    out = native.decode_png_resize(data, 64, 48)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(out, native.smart_resize(pil, 64, 48))


@png_needed
def test_png_16bit_rejected_to_pil_fallback():
    """16-bit PNGs must NOT decode natively: libpng's 8-bit conversion is
    a linear->sRGB gamma encode while PIL does a plain bit-depth
    reduction — the native path rejects (None) so pixels stay identical
    on hosts with and without the library."""
    import io

    deep = (np.linspace(0, 65535, 80 * 100, dtype=np.uint32)
            .reshape(80, 100).astype(np.uint16))
    buf = io.BytesIO()
    Image.fromarray(deep.astype(np.int32), "I").convert("I;16").save(
        buf, "PNG")
    data = buf.getvalue()
    assert native.sniff_format(data) == "png"
    assert native.decode_png_resize(data, 64, 48) is None
    assert native.decode_image_resize(data, 64, 48) is None  # -> PIL path


@png_needed
def test_png_palette_and_gray_expand():
    import io

    gray = _smooth_image(100, 100)[:, :, 0]
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "PNG")
    out = native.decode_png_resize(buf.getvalue(), 64, 64)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.array_equal(out, native.smart_resize(pil, 64, 64))
    pal = Image.fromarray(_smooth_image(90, 110)).quantize(64)
    buf = io.BytesIO()
    pal.save(buf, "PNG")
    out = native.decode_png_resize(buf.getvalue(), 64, 48)
    pil = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    assert np.array_equal(out, native.smart_resize(pil, 64, 48))


@webp_needed
def test_webp_lossless_decode_matches_pil_exactly():
    data = _encoded("WEBP", _smooth_image(200, 300), lossless=True)
    assert native.image_info(data) == (200, 300)
    out = native.decode_webp_resize(data, 96, 64)
    pil = np.asarray(Image.open(__import__("io").BytesIO(data)).convert("RGB"))
    assert np.array_equal(out, native.smart_resize(pil, 96, 64))


@decode_needed
def test_decode_image_resize_dispatches_by_magic():
    img = _smooth_image(150, 200)
    for fmt, kw in [("JPEG", {"quality": 92}), ("PNG", {}),
                    ("WEBP", {"lossless": True})]:
        if not native.decode_available(fmt.lower().replace("jpeg", "jpeg")):
            continue
        data = _encoded(fmt, img, **kw)
        out = native.decode_image_resize(data, 64, 64)
        assert out is not None and out.shape == (64, 64, 3), fmt
    assert native.decode_image_resize(b"\x00\x01not-an-image", 64, 64) is None


def test_bilinear_distort_matches_pil_square_resize():
    """The reference's inference transform: distorting BILINEAR square
    resize (modules.py:136-140).  Native within ±1 of PIL."""
    src = _smooth_image(300, 400)
    out = native.smart_resize(src, 64, 64, "distort", resample="bilinear")
    ref = np.asarray(Image.fromarray(src).resize((64, 64), Image.BILINEAR))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


@decode_needed
def test_loader_square_path_uses_native_bilinear(tmp_path):
    """resolution= (inference) loading routes through the fused native
    decode with the bilinear filter and stays within ±1 of the PIL path."""
    from vae_tagger_tpu.data.bucketing import load_and_transform_image

    src = _smooth_image(300, 400)
    for name, fmt in [("a.jpg", "JPEG"), ("a.png", "PNG")]:
        if fmt == "PNG" and not native.decode_available("png"):
            continue
        p = tmp_path / name
        Image.fromarray(src).save(p)
        out = load_and_transform_image(str(p), resolution=64)
        img = Image.open(p).convert("RGB")
        ref = np.asarray(img.resize((64, 64), Image.BILINEAR))
        diff = np.abs(out.astype(int) - ref.astype(int))
        # JPEG may engage DCT scaling (q>=2 guard keeps it close)
        assert diff.mean() < 1.0, (name, diff.mean())


def test_decode_bytes_square_matches_file_loader(tmp_path):
    """decode_bytes_square (the bytes-level policy shared with the HTTP
    server) produces exactly what the file loader's square mode produces —
    one owner for the transform, native or PIL fallback alike."""
    from vae_tagger_tpu.data.bucketing import (
        decode_bytes_square,
        load_and_transform_image,
    )

    src = _smooth_image(300, 400)
    p = tmp_path / "img.jpg"
    Image.fromarray(src).save(p)
    data = p.read_bytes()
    np.testing.assert_array_equal(
        decode_bytes_square(data, 64),
        load_and_transform_image(str(p), resolution=64))


@png_needed
def test_loader_one_call_png_path(tmp_path):
    """Bucket-mode loading of a PNG goes through the one-call native decode
    (round-2 gap: PNG fell back to PIL) and matches the PIL pipeline."""
    from vae_tagger_tpu.data.bucketing import load_and_transform_image

    src = _smooth_image(600, 450)
    p = tmp_path / "img.png"
    Image.fromarray(src).save(p)
    out = load_and_transform_image(str(p), bucket=(128, 128))
    assert out.shape == (128, 128, 3) and out.dtype == np.uint8
    ref = np.asarray(SmartResize(128, 128)(Image.open(p).convert("RGB")))
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 3
