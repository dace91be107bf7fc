"""Data-layer tests: COLMAP binary parsing against hand-crafted byte
fixtures, Blender JSON loading, image/mask IO, Scene orchestration."""

import json
import random
import struct
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from easy_gaussian_splatting_tpu.scene.colmap import (
    load_cameras_binary,
    load_images_binary,
    load_points3d_binary,
    load_colmap_data,
)
from easy_gaussian_splatting_tpu.scene.blender import (
    load_blender_data,
    generate_pointcloud,
)
from easy_gaussian_splatting_tpu.scene.image_io import (
    expand_mask,
    get_downscale_factor,
    load_image,
    load_mask,
)
from easy_gaussian_splatting_tpu.scene.scene import Scene, prefetch_frames
from easy_gaussian_splatting_tpu.scene.types import quat_to_rotmat_np


# ---------------------------------------------------------------- fixtures
def write_colmap_scene(root: Path, n_images=4, width=16, height=12, n_points=20):
    """Create a minimal valid COLMAP scene with images on disk."""
    sparse = root / "sparse" / "0"
    sparse.mkdir(parents=True)
    (root / "images").mkdir()

    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, width, height))  # id=1 PINHOLE
        f.write(struct.pack("<dddd", 20.0, 21.0, 8.0, 6.0))

    # images.bin: n_images identity-ish poses with 2D tracks to skip
    rng = np.random.default_rng(0)
    quats, transs = [], []
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            t = rng.normal(size=3)
            quats.append(q)
            transs.append(t)
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            n_pts2d = i  # variable-length track
            f.write(struct.pack("<Q", n_pts2d))
            for j in range(n_pts2d):
                f.write(struct.pack("<ddq", 1.0, 2.0, -1))

    # points3D.bin with variable-length tracks
    xyzs = rng.normal(size=(n_points, 3))
    rgbs = rng.integers(0, 256, size=(n_points, 3))
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_points))
        for i in range(n_points):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *xyzs[i]))
            f.write(struct.pack("<BBB", *rgbs[i]))
            f.write(struct.pack("<d", 0.5))
            track_len = i % 3
            f.write(struct.pack("<Q", track_len))
            for j in range(track_len):
                f.write(struct.pack("<ii", 1, j))

    # images on disk
    for i in range(n_images):
        arr = np.full((height, width, 3), i * 10, np.uint8)
        Image.fromarray(arr).save(root / "images" / f"img_{i:03d}.png")

    return quats, transs, xyzs, rgbs


def write_blender_scene(root: Path, n_train=3, n_test=2, size=16):
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1)

    def make_split(name, n):
        (root / name).mkdir(exist_ok=True)
        frames = []
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = rng.normal(size=3) * 3
            frames.append(
                {
                    "file_path": f"./{name}/r_{i}",
                    "transform_matrix": c2w.tolist(),
                }
            )
            rgba = np.zeros((size, size, 4), np.uint8)
            rgba[4:12, 4:12] = [255, 0, 0, 255]  # opaque red square
            Image.fromarray(rgba, "RGBA").save(root / name / f"r_{i}.png")
        with open(root / f"transforms_{name}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    make_split("train", n_train)
    make_split("test", n_test)
    make_split("val", 1)


# ------------------------------------------------------------------ tests
class TestColmapParsers:
    def test_cameras(self, tmp_path):
        write_colmap_scene(tmp_path)
        cams = load_cameras_binary(tmp_path / "sparse" / "0" / "cameras.bin")
        assert len(cams) == 1
        cam = cams[1]
        assert cam.model_name == "PINHOLE"
        assert (cam.width, cam.height) == (16, 12)
        assert (cam.fx, cam.fy, cam.cx, cam.cy) == (20.0, 21.0, 8.0, 6.0)

    def test_images(self, tmp_path):
        quats, transs, _, _ = write_colmap_scene(tmp_path)
        ims = load_images_binary(tmp_path / "sparse" / "0" / "images.bin")
        assert len(ims) == 4
        for i in range(4):
            im = ims[i + 1]
            assert im.file_name == f"img_{i:03d}.png"
            np.testing.assert_allclose(im.quat, quats[i], atol=1e-12)
            np.testing.assert_allclose(im.trans, transs[i], atol=1e-12)

    def test_points(self, tmp_path):
        _, _, xyzs, rgbs = write_colmap_scene(tmp_path)
        pc = load_points3d_binary(tmp_path / "sparse" / "0" / "points3D.bin")
        assert pc.nbr_points == 20
        np.testing.assert_allclose(pc.xyzs, xyzs, atol=1e-6)
        np.testing.assert_array_equal(pc.rgbs, rgbs)

    def test_load_colmap_data_split(self, tmp_path):
        write_colmap_scene(tmp_path)
        random.seed(0)
        frames, pc, train_idx, eval_idx = load_colmap_data(
            str(tmp_path), False, 0, eval=True, eval_split_ratio=0.25,
            white_background=False,
        )
        assert len(frames) == 4
        assert len(eval_idx) == 1
        assert len(train_idx) == 3
        assert set(train_idx) | set(eval_idx) == {0, 1, 2, 3}
        # frames sorted by path
        names = [f.image_path.name for f in frames]
        assert names == sorted(names)
        # w2c built from quaternion
        np.testing.assert_allclose(
            frames[0].w2c[3], [0, 0, 0, 1], atol=1e-6
        )

    def test_no_eval_split(self, tmp_path):
        write_colmap_scene(tmp_path)
        random.seed(0)
        _, _, train_idx, eval_idx = load_colmap_data(
            str(tmp_path), False, 0, eval=False, eval_split_ratio=0.25,
            white_background=False,
        )
        assert len(train_idx) == 4  # all frames train when eval=False


class TestBlenderLoader:
    def test_load(self, tmp_path):
        write_blender_scene(tmp_path)
        np.random.seed(0)
        frames, pc, train_idx, eval_idx = load_blender_data(
            str(tmp_path), False, 0, eval=True, eval_in_val=False,
            eval_in_test=True, white_background=True,
        )
        assert len(frames) == 5  # 2 test (eval) + 3 train
        assert len(eval_idx) == 2 and len(train_idx) == 3
        f = frames[0]
        # focal from camera_angle_x
        expected_f = 16 / (2 * np.tan(0.4))
        np.testing.assert_allclose(f.fx, expected_f, rtol=1e-6)
        assert pc.nbr_points == 100000
        assert np.all(pc.rgbs == 127)

    def test_opengl_to_opencv_flip(self, tmp_path):
        write_blender_scene(tmp_path)
        np.random.seed(0)
        frames, _, _, _ = load_blender_data(
            str(tmp_path), False, 0, eval=False, eval_in_val=False,
            eval_in_test=False, white_background=True,
        )
        # identity-rotation blender c2w with translation t:
        # after flip, c2w rotation = diag(1,-1,-1)
        c2w = np.linalg.inv(frames[0].w2c)
        np.testing.assert_allclose(
            c2w[:3, :3], np.diag([1.0, -1.0, -1.0]), atol=1e-6
        )

    def test_pointcloud_bbox_shrink(self, tmp_path):
        write_blender_scene(tmp_path, n_train=8)
        np.random.seed(0)
        frames, _, _, _ = load_blender_data(
            str(tmp_path), False, 0, eval=False, eval_in_val=False,
            eval_in_test=False, white_background=True,
        )
        pc = generate_pointcloud(frames, num_points=1000)
        positions = np.stack(
            [np.linalg.inv(f.w2c)[:3, 3] for f in frames]
        )
        mx, mn = positions.max(), positions.min()
        c = (mx + mn) / 2
        assert pc.xyzs.min() >= c - (c - mn) / 3 - 1e-6
        assert pc.xyzs.max() <= c + (mx - c) / 3 + 1e-6


class TestImageIO:
    def test_rgba_composite_white(self, tmp_path):
        rgba = np.zeros((4, 4, 4), np.uint8)
        rgba[0, 0] = [200, 0, 0, 255]  # opaque red
        rgba[1, 1] = [0, 200, 0, 0]  # fully transparent
        rgba[2, 2] = [0, 0, 200, 128]  # half transparent
        p = tmp_path / "t.png"
        Image.fromarray(rgba, "RGBA").save(p)
        out_w = load_image(p, white_background=True)
        np.testing.assert_array_equal(out_w[0, 0], [200, 0, 0])
        np.testing.assert_array_equal(out_w[1, 1], [255, 255, 255])
        a = 128 / 255
        np.testing.assert_allclose(
            out_w[2, 2], [255 * (1 - a), 255 * (1 - a), 200 * a + 255 * (1 - a)],
            atol=1.0,
        )
        out_b = load_image(p, white_background=False)
        np.testing.assert_array_equal(out_b[1, 1], [0, 0, 0])

    def test_mask_binarize_and_expand(self, tmp_path):
        mask = np.zeros((9, 9), np.uint8)
        mask[4, 4] = 7  # any >=1 becomes 1
        p = tmp_path / "m.png"
        Image.fromarray(mask).save(p)
        m0 = load_mask(p, 0)
        assert m0[4, 4] == 1 and m0.sum() == 1
        m1 = load_mask(p, 1)
        # definition: out[y,x] = any mask in window [y-e+1..y+e] x [x-e+1..x+e]
        e = 1
        by_def = np.zeros((9, 9), np.uint8)
        for y in range(9):
            for x in range(9):
                window = mask[
                    max(0, y - e + 1) : y + e + 1, max(0, x - e + 1) : x + e + 1
                ]
                by_def[y, x] = 1 if (window >= 1).any() else 0
        np.testing.assert_array_equal(m1, by_def)
        assert m1.sum() == 4  # 2x2 block

    def test_expand_mask_matches_definition(self, rng):
        mask = (rng.uniform(size=(20, 17)) < 0.1).astype(np.uint8)
        for e in [1, 2, 3]:
            ours = expand_mask(mask, e)
            by_def = np.zeros_like(mask)
            h, w = mask.shape
            for y in range(h):
                for x in range(w):
                    window = mask[
                        max(0, y - e + 1) : y + e + 1,
                        max(0, x - e + 1) : x + e + 1,
                    ]
                    by_def[y, x] = 1 if window.any() else 0
            np.testing.assert_array_equal(ours, by_def, err_msg=f"e={e}")

    def test_downscale_factor(self):
        assert get_downscale_factor(100, 200, 100, 200) == 1.0
        assert get_downscale_factor(100, 200, 50, 100) == 0.5
        with pytest.raises(ValueError):
            get_downscale_factor(100, 200, 50, 200)


class TestScene:
    def test_scene_tiling_and_export(self, tmp_path):
        write_colmap_scene(tmp_path)
        random.seed(0)
        out = tmp_path / "out"
        scene = Scene(
            str(tmp_path), "colmap", str(out), total_iterations=10,
            eval=True, eval_split_ratio=0.25, eval_in_val=False,
            eval_in_test=True, use_masks=False, mask_expand_pixels=0,
            white_background=False,
        )
        assert scene.nbr_data("train") == 10  # tiled to total_iterations
        assert scene.nbr_data("eval") == 1
        cams = json.loads((out / "cameras.json").read_text())
        assert len(cams) == 4
        assert {c["id"] for c in cams} == {0, 1, 2, 3}

    def test_get_data_contents(self, tmp_path):
        write_colmap_scene(tmp_path)
        random.seed(0)
        scene = Scene(
            str(tmp_path), "colmap", None, total_iterations=10,
            eval=False, eval_split_ratio=0.25, eval_in_val=False,
            eval_in_test=True, use_masks=False, mask_expand_pixels=0,
            white_background=False,
        )
        d = scene.get_data("train", 0)
        assert d["image"].shape == (12, 16, 3)
        assert d["mask"].shape == (12, 16)
        assert d["K"].shape == (3, 3)
        assert d["w2c"].shape == (4, 4)
        assert d["image"].dtype == np.float32
        assert 0.0 <= d["image"].min() and d["image"].max() <= 1.0

    def test_prefetch_matches_sequential(self, tmp_path):
        write_colmap_scene(tmp_path)
        random.seed(0)
        scene = Scene(
            str(tmp_path), "colmap", None, total_iterations=8,
            eval=False, eval_split_ratio=0.25, eval_in_val=False,
            eval_in_test=True, use_masks=False, mask_expand_pixels=0,
            white_background=False,
        )
        seq = [scene.get_data("train", i) for i in range(8)]
        pre = list(prefetch_frames(scene, "train", num_workers=3))
        assert len(pre) == 8
        for a, b in zip(seq, pre):
            np.testing.assert_array_equal(a["image"], b["image"])
            np.testing.assert_array_equal(a["w2c"], b["w2c"])

    def test_too_few_iterations_raises(self, tmp_path):
        write_colmap_scene(tmp_path)
        random.seed(0)
        with pytest.raises(ValueError):
            Scene(
                str(tmp_path), "colmap", None, total_iterations=2,
                eval=False, eval_split_ratio=0.25, eval_in_val=False,
                eval_in_test=True, use_masks=False, mask_expand_pixels=0,
                white_background=False,
            )


class TestDeviceFrameCache:
    """Device-resident dataset cache (scene/device_cache.py): one upload,
    jitted per-step slicing, exact round-trip vs Scene.get_data."""

    def _scene(self, tmp_path, iters=7):
        from easy_gaussian_splatting_tpu.scene.scene import Scene
        from easy_gaussian_splatting_tpu.utils.synthetic import (
            generate_blender_scene,
        )

        generate_blender_scene(
            tmp_path, n_train=3, n_test=2, image_size=16, n_gaussians=10,
            with_masks=True,
        )
        np.random.seed(0)
        return Scene(
            str(tmp_path), "blender", None, iters, True, 0.2, False, True,
            True, 1, True, blender_init_points=50,
        )

    def test_roundtrip_matches_get_data(self, tmp_path):
        from easy_gaussian_splatting_tpu.scene.device_cache import (
            build_cache,
        )

        scene = self._scene(tmp_path)
        cache = build_cache(scene, "train", budget_mb=64)
        assert cache is not None
        # index tiling: 7 iterations over 3 unique frames share 3 copies
        for i in (0, 2, 5):  # 5 repeats frame 2
            got = cache.get(i)
            ref = scene.get_data("train", i)
            for k in ("image", "mask", "w2c", "K"):
                np.testing.assert_array_equal(np.asarray(got[k]), ref[k])
            assert (got["height"], got["width"]) == (
                ref["image"].shape[0], ref["image"].shape[1]
            )

    def test_budget_fallback(self, tmp_path):
        from easy_gaussian_splatting_tpu.scene.device_cache import (
            build_cache,
        )

        scene = self._scene(tmp_path)
        assert build_cache(scene, "train", budget_mb=0) is None

    def test_eval_split(self, tmp_path):
        from easy_gaussian_splatting_tpu.scene.device_cache import (
            build_cache,
        )

        scene = self._scene(tmp_path)
        cache = build_cache(scene, "eval", budget_mb=64)
        ref = scene.get_data("eval", 1)
        got = cache.get(1)
        np.testing.assert_array_equal(np.asarray(got["image"]), ref["image"])
