"""Native batched JPEG decoder tests (skipped when the toolchain/.so is
unavailable)."""

import io

import numpy as np
import pytest
from PIL import Image

from hmmc_tpu.data import jpeg_native

pytestmark = pytest.mark.skipif(
    not jpeg_native.available(), reason="native decoder not built")


def _smooth_jpeg(h=120, w=160, q=95):
    y, x = np.mgrid[0:h, 0:w]
    img = np.clip(np.stack(
        [x / w * 255, y / h * 255, 128 + 80 * np.sin(x / 17)], axis=-1),
        0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=q)
    return buf.getvalue()


def test_decode_batch_shapes_and_accuracy():
    from hmmc_tpu.data.datasets import _decode_eval

    blobs = [_smooth_jpeg() for _ in range(5)]
    out = jpeg_native.decode_batch(blobs, 64, num_threads=1)
    assert out.shape == (5, 64, 64, 3) and out.dtype == np.uint8
    ref = _decode_eval(blobs[0], 64)
    diff = np.abs(out[0].astype(int) - ref.astype(int)).mean()
    assert diff < 3.0  # bilinear+DCT-prescale vs PIL bicubic, smooth content


def test_decode_batch_bad_blob_zero_filled():
    blobs = [_smooth_jpeg(), b"not a jpeg at all"]
    out = jpeg_native.decode_batch(blobs, 32, num_threads=1)
    assert out[1].sum() == 0
    assert out[0].sum() > 0


def test_decode_batch_threads_consistent():
    blobs = [_smooth_jpeg(40 + 8 * i, 60 + 4 * i) for i in range(6)]
    a = jpeg_native.decode_batch(blobs, 48, num_threads=1)
    b = jpeg_native.decode_batch(blobs, 48, num_threads=3)
    np.testing.assert_array_equal(a, b)
