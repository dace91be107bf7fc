"""Native C++ helper tests: build, then verify equivalence with the
pure-Python parsers/dilation on the same inputs."""

import os
import struct

import numpy as np
import pytest

from easy_gaussian_splatting_tpu import native
from easy_gaussian_splatting_tpu.scene.image_io import expand_mask
from test_scene import write_colmap_scene


@pytest.fixture(scope="module")
def lib():
    lib = native.get_library()
    if lib is None:
        pytest.skip("native library unavailable (no compiler?)")
    return lib


class TestNativeParsers:
    def test_points3d_matches_python(self, tmp_path, lib):
        _, _, xyzs, rgbs = write_colmap_scene(tmp_path)
        buf = (tmp_path / "sparse" / "0" / "points3D.bin").read_bytes()
        out = native.parse_points3d(buf)
        assert out is not None
        xyz, rgb = out
        np.testing.assert_allclose(xyz, xyzs, atol=1e-6)
        np.testing.assert_array_equal(rgb, rgbs)

    def test_images_matches_python(self, tmp_path, lib):
        quats, transs, _, _ = write_colmap_scene(tmp_path)
        buf = (tmp_path / "sparse" / "0" / "images.bin").read_bytes()
        out = native.parse_images(buf)
        assert out is not None
        ids, cam_ids, q, t, names = out
        assert list(ids) == [1, 2, 3, 4]
        assert list(cam_ids) == [1, 1, 1, 1]
        np.testing.assert_allclose(q, np.stack(quats), atol=1e-12)
        np.testing.assert_allclose(t, np.stack(transs), atol=1e-12)
        assert names == [f"img_{i:03d}.png" for i in range(4)]

    def test_truncated_buffer_rejected(self, tmp_path, lib):
        write_colmap_scene(tmp_path)
        buf = (tmp_path / "sparse" / "0" / "points3D.bin").read_bytes()
        assert native.parse_points3d(buf[:-10]) is None

    def test_dilate_matches_python(self, rng, lib):
        mask = (rng.uniform(size=(33, 47)) < 0.08).astype(np.uint8)
        for e in [1, 2, 4]:
            got = native.dilate_mask(mask, e)
            assert got is not None
            # pure python path (force fallback via env toggle is global;
            # replicate the definition directly instead)
            h, w = mask.shape
            expected = np.zeros_like(mask)
            for y in range(h):
                for x in range(w):
                    win = mask[
                        max(0, y - e + 1) : y + e + 1,
                        max(0, x - e + 1) : x + e + 1,
                    ]
                    expected[y, x] = 1 if win.any() else 0
            np.testing.assert_array_equal(got, expected, err_msg=f"e={e}")

    def test_expand_mask_uses_native(self, rng, lib):
        # integration: the image_io entry point should give identical
        # results whether or not the native path is active
        mask = (rng.uniform(size=(20, 20)) < 0.1).astype(np.uint8)
        out = expand_mask(mask, 2)
        got = native.dilate_mask(mask, 2)
        np.testing.assert_array_equal(out, got)
