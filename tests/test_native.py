"""Native host-ops library tests (native/host_ops.cpp via ctypes)."""

import numpy as np
import pytest

from tpufusion.data import native


rng = np.random.RandomState(0)


class TestNativeOps:
    def test_normalize_matches_numpy(self):
        u8 = (rng.rand(17, 23, 3) * 255).astype(np.uint8)
        out = native.normalize_u8_to_pm1(u8)
        np.testing.assert_allclose(out, u8.astype(np.float32) / 255 * 2 - 1, atol=1e-6)

    def test_pm1_to_u8_roundtrip(self):
        u8 = (rng.rand(9, 9, 3) * 255).astype(np.uint8)
        back = native.pm1_to_u8(native.normalize_u8_to_pm1(u8))
        assert np.abs(back.astype(int) - u8.astype(int)).max() <= 1

    def test_resize_shape_and_identity(self):
        u8 = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        same = native.resize_normalize(u8, 32, 32)
        np.testing.assert_allclose(
            same, u8.astype(np.float32) / 255 * 2 - 1, atol=1e-5
        )
        half = native.resize_normalize(u8, 16, 8)
        assert half.shape == (16, 8, 3)
        assert abs(half.mean() - same.mean()) < 0.05  # mean-preserving

    def test_resize_fallback_matches_native(self, monkeypatch):
        """The numpy fallback must reproduce the native kernel EXACTLY,
        including edge handling on upscales (coords clamp to the edge
        row/col; the old clipped-floor fallback blended toward the
        interior at the top/left edges)."""
        lib = native._load()
        if not lib:
            pytest.skip("native lib unavailable — nothing to compare")
        u8 = (rng.rand(2, 2, 3) * 255).astype(np.uint8)
        want_up = native.resize_normalize(u8, 8, 8)
        big = (rng.rand(23, 17, 3) * 255).astype(np.uint8)
        want_down = native.resize_normalize(big, 7, 5)
        monkeypatch.setattr(native, "_load", lambda: None)
        np.testing.assert_allclose(
            native.resize_normalize(u8, 8, 8), want_up, atol=1e-4)
        np.testing.assert_allclose(
            native.resize_normalize(big, 7, 5), want_down, atol=1e-4)

    def test_avg_pool_matches_numpy(self):
        f = rng.rand(2, 8, 12, 3).astype(np.float32)
        out = native.avg_pool(f, 2)
        np.testing.assert_allclose(
            out, f.reshape(2, 4, 2, 6, 2, 3).mean((2, 4)), atol=1e-6
        )

    def test_montage_strip_geometry(self):
        f = rng.rand(5, 8, 8, 3).astype(np.float32)
        out = native.montage_strip(f, padding=2)
        # reference FFHQ montage: N panels -> N*(W+pad)+pad wide (SURVEY §4)
        assert out.shape == (12, 5 * 10 + 2, 3)
        np.testing.assert_allclose(out[2:10, 2:10], f[0], atol=1e-6)
        np.testing.assert_allclose(out[0, 0], [-1, -1, -1], atol=1e-6)

    def test_transform_uses_native_path(self, tmp_path):
        from PIL import Image

        from tpufusion.data import transform_for

        u8 = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        img = Image.fromarray(u8)
        out = transform_for("church", "test")(img)
        assert out.shape == (256, 256, 3)
        assert -1.0 <= out.min() and out.max() <= 1.0
