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

    def test_lanczos_matches_pil_bitexact(self):
        """resize_lanczos_batch is a bit-faithful port of PIL's fixed-point
        LANCZOS convolution — the data path swaps it in for per-image PIL
        (dataset/shims.py rescale_batch) without changing reference
        semantics (crop_shim.py:80-95)."""
        from PIL import Image

        rng = np.random.default_rng(3)
        for h, w, h2, w2 in [(90, 160, 64, 114), (64, 114, 96, 96), (50, 50, 64, 64)]:
            imgs = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
            out = native.resize_lanczos_batch(imgs, (h2, w2))
            ref = np.stack(
                [
                    np.asarray(Image.fromarray(im).resize((w2, h2), Image.LANCZOS))
                    for im in imgs
                ]
            )
            np.testing.assert_array_equal(out, ref)

    def test_rescale_batch_shim_uses_lanczos_semantics(self):
        """The shim's batch path equals its own per-image PIL fallback."""
        from transplat_tpu.dataset.shims import rescale_batch, rescale_image

        rng = np.random.default_rng(4)
        imgs = rng.random((2, 45, 80, 3)).astype(np.float32)
        got = rescale_batch(imgs, (64, 114))
        want = np.stack([rescale_image(im, (64, 114)) for im in imgs])
        np.testing.assert_allclose(got, want, atol=1e-6)
