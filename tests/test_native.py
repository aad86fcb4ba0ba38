"""Native C++ image preprocessing: bit-exactness vs the PIL reference path."""

import numpy as np
import pytest
from PIL import Image

from aria_tpu.data import native_ops
from aria_tpu.data.vision_processor import AriaVisionProcessor

pytestmark = pytest.mark.skipif(
    not native_ops.available(), reason="native lib unavailable (no g++?)"
)


class TestNativeImageOps:
    def test_resize_bit_exact_with_pil(self):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (123, 457, 3), np.uint8)
        for dw, dh in [(980, 264), (490, 132), (336, 490)]:
            pil = np.asarray(Image.fromarray(img).resize((dw, dh), Image.Resampling.BICUBIC))
            nat = native_ops.resize_bicubic(img, dh, dw)
            np.testing.assert_array_equal(nat, pil)

    def test_processor_native_matches_pil_path(self, monkeypatch):
        rng = np.random.RandomState(2)
        img = Image.fromarray(rng.randint(0, 255, (300, 500, 3), np.uint8))
        proc = AriaVisionProcessor()
        native = proc([img], max_image_size=490)
        monkeypatch.setattr(
            "aria_tpu.data.vision_processor._native_available", lambda: False
        )
        pil = proc([img], max_image_size=490)
        np.testing.assert_allclose(
            native.pixel_values, pil.pixel_values, atol=1e-6
        )
        np.testing.assert_array_equal(native.pixel_mask, pil.pixel_mask)

    def test_pad_normalize(self):
        img = np.full((10, 20, 3), 255, np.uint8)
        out, mask = native_ops.pad_normalize_chw(img, 32, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
        assert out.shape == (3, 32, 32)
        np.testing.assert_allclose(out[:, :10, :20], 1.0, atol=1e-6)
        np.testing.assert_allclose(out[:, 10:, :], -1.0, atol=1e-6)  # pad -> (0-0.5)/0.5
        assert mask[:10, :20].all() and not mask[10:, :].any()
