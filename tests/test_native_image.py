"""Native image pipeline: decode + crop/resize parity with the numpy/PIL paths."""

import numpy as np
import pytest
from PIL import Image

from pytracking_tpu.utils import native_image as ni


def test_decode_jpeg_matches_pil(tmp_path):
    rng = np.random.RandomState(0)
    im = (rng.rand(24, 32, 3) * 255).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    Image.fromarray(im).save(path, quality=95)
    native = ni.decode_jpeg(path)
    pil = np.asarray(Image.open(path).convert("RGB"))
    assert native.shape == pil.shape
    # both decode the same compressed data: allow small IDCT rounding differences
    assert np.abs(native.astype(int) - pil.astype(int)).mean() < 2.0


@pytest.mark.skipif(not ni.native_available(), reason="native lib not built")
def test_crop_resize_native_matches_numpy():
    rng = np.random.RandomState(1)
    src = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    args = (5.3, 7.9, 20.0, 25.0, (16, 16))
    native = ni.crop_resize(src, *args[:-1], out_hw=args[-1])
    # force the numpy fallback for comparison
    lib = ni._lib
    ni._lib = None
    try:
        ref = ni.crop_resize(src, *args[:-1], out_hw=args[-1])
    finally:
        ni._lib = lib
    assert native.shape == ref.shape == (16, 16, 3)
    assert np.abs(native.astype(int) - ref.astype(int)).max() <= 1


def test_crop_resize_identity():
    src = (np.arange(12 * 10 * 3) % 255).astype(np.uint8).reshape(12, 10, 3)
    out = ni.crop_resize(src, 0.0, 0.0, 12.0, 10.0, (12, 10))
    np.testing.assert_array_equal(out, src)
