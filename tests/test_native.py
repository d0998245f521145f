import io

import numpy as np
import pytest
from PIL import Image

from transplat_tpu import native


def make_blobs(n=4, shape=(60, 80)):
    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(n):
        img = (rng.random((*shape, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=90)
        blobs.append(buf.getvalue())
    return blobs


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
class TestNativeLoader:
    def test_decode_matches_pil(self):
        blobs = make_blobs()
        out = native.decode_jpeg_batch(blobs)
        ref = np.stack(
            [np.asarray(Image.open(io.BytesIO(b)).convert("RGB")) for b in blobs]
        )
        assert out is not None
        np.testing.assert_array_equal(out, ref)

    def test_resize_shape_and_range(self):
        blobs = make_blobs()
        imgs = native.decode_jpeg_batch(blobs)
        small = native.resize_bilinear_batch(imgs, (30, 40))
        assert small.shape == (4, 30, 40, 3)
        assert small.dtype == np.uint8

    def test_resize_constant_image(self):
        imgs = np.full((2, 16, 16, 3), 127, np.uint8)
        out = native.resize_bilinear_batch(imgs, (8, 8))
        np.testing.assert_array_equal(out, np.full((2, 8, 8, 3), 127, np.uint8))

    def test_corrupt_jpeg_returns_none(self):
        assert native.decode_jpeg_batch([b"not a jpeg"]) is None
