"""Native resampler + PNG decoder: build, PIL agreement, loader integration,
speed."""

import io
import time

import numpy as np
import PIL.Image
import pytest

from vivid_tpu.native.fast_image import (decode_png_rgb, fast_resize_available,
                                         load_rgb, png_decode_available,
                                         resize_bilinear_u8)


@pytest.mark.skipif(not fast_resize_available(),
                    reason="no C toolchain in this environment")
def test_matches_pil_bilinear():
    rng = np.random.RandomState(0)
    for (h, w, size) in [(360, 360, 64), (97, 97, 32), (64, 64, 256)]:
        img = rng.randint(0, 256, (h, w, 3), np.uint8)
        got = resize_bilinear_u8(img, size)
        want = np.asarray(PIL.Image.fromarray(img, "RGB").resize(
            (size, size), PIL.Image.Resampling.BILINEAR), dtype=np.float32)
        # PIL quantizes to uint8 at the end; ours stays float — agree to the
        # rounding step.
        diff = np.abs(got - want)
        assert float(np.mean(diff <= 1.0)) > 0.995, \
            f"{h}x{w}->{size}: mean|diff| {diff.mean():.3f} max {diff.max():.1f}"


@pytest.mark.skipif(not fast_resize_available(),
                    reason="no C toolchain in this environment")
def test_faster_than_pil():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (360, 360, 3), np.uint8)

    t0 = time.perf_counter()
    for _ in range(50):
        resize_bilinear_u8(img, 64)
    native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(50):
        np.asarray(PIL.Image.fromarray(img, "RGB").resize(
            (64, 64), PIL.Image.Resampling.BILINEAR), dtype=np.float32)
    pil = time.perf_counter() - t0
    # Informational: assert no pathological slowdown rather than a hard win
    # (PIL's SIMD can be fast; the native path removes object churn/GIL spans).
    assert native < pil * 3, f"native {native:.3f}s vs pil {pil:.3f}s"


@pytest.mark.skipif(not png_decode_available(),
                    reason="no C toolchain in this environment")
def test_png_decode_matches_pil():
    rng = np.random.RandomState(2)
    cases = []
    rgb = rng.randint(0, 256, (41, 57, 3), np.uint8)
    cases.append(PIL.Image.fromarray(rgb, "RGB"))                     # type 2
    cases.append(PIL.Image.fromarray(rgb[..., 0], "L"))               # type 0
    cases.append(PIL.Image.fromarray(rgb, "RGB").convert("P"))        # type 3
    rgba = np.concatenate([rgb, rng.randint(0, 256, (41, 57, 1), np.uint8)], -1)
    cases.append(PIL.Image.fromarray(rgba, "RGBA"))                   # type 6
    cases.append(PIL.Image.merge("LA", [PIL.Image.fromarray(rgb[..., 0], "L"),
                                        PIL.Image.fromarray(rgb[..., 1], "L")]))
    # Gradient image exercises the Sub/Up/Avg/Paeth filter predictors.
    grad = (np.arange(64)[:, None, None] + np.arange(64)[None, :, None]
            + np.arange(3)[None, None, :]).astype(np.uint8)
    cases.append(PIL.Image.fromarray(grad, "RGB"))
    for im in cases:
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        want = np.asarray(PIL.Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
        got = decode_png_rgb(buf.getvalue())
        np.testing.assert_array_equal(got, want, err_msg=f"mode {im.mode}")


@pytest.mark.skipif(not png_decode_available(),
                    reason="no C toolchain in this environment")
def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png_rgb(b"not a png at all")
    # 16-bit PNGs are out of scope for the native path.
    img16 = PIL.Image.fromarray(
        np.random.RandomState(3).randint(0, 65535, (8, 8), np.uint16), "I;16")
    buf = io.BytesIO()
    img16.save(buf, format="PNG")
    with pytest.raises(ValueError):
        decode_png_rgb(buf.getvalue())


def test_load_rgb_roundtrip(tmp_path):
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (33, 29, 3), np.uint8)
    p = str(tmp_path / "img.png")
    PIL.Image.fromarray(img, "RGB").save(p)
    np.testing.assert_array_equal(load_rgb(p), img)
    # Non-PNG goes through the PIL fallback.
    j = str(tmp_path / "img.jpg")
    PIL.Image.fromarray(img, "RGB").save(j, quality=95)
    out = load_rgb(j)
    assert out.shape == (33, 29, 3) and out.dtype == np.uint8


def test_collate_uses_fast_path_when_available():
    from vivid_tpu.data.collate import resize_image
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (100, 100, 3), np.uint8)
    out = resize_image(img, 64)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 255


@pytest.mark.skipif(not fast_resize_available(),
                    reason="no C toolchain in this environment")
def test_box_downscale_matches_numpy_mean():
    """resize_box_u8 must be BIT-identical to the numpy reshape+mean fast
    path it replaces (integer sums are exact in fp32, both divide last)."""
    from vivid_tpu.native.fast_image import resize_box_u8
    rng = np.random.RandomState(1)
    for f, size in [(2, 128), (3, 32), (4, 64)]:
        img = rng.randint(0, 256, (size * f, size * f, 3), np.uint8)
        want = img.reshape(size, f, size, f, 3).mean(axis=(1, 3),
                                                     dtype=np.float32)
        got = resize_box_u8(img, f)
        assert got.dtype == np.float32 and got.shape == want.shape
        assert np.array_equal(got, want), (f, np.abs(got - want).max())
