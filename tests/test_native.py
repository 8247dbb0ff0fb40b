"""Native resampler: build, PIL agreement, loader integration, speed."""

import time

import numpy as np
import PIL.Image
import pytest

from vivid_tpu.native.fast_image import fast_resize_available, resize_bilinear_u8


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


def test_collate_uses_fast_path_when_available():
    from vivid_tpu.data.collate import resize_image
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (100, 100, 3), np.uint8)
    out = resize_image(img, 64)
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32
    assert 0 <= out.min() and out.max() <= 255
