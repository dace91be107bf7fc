"""Viewer tests: SE3 math, camera interpolation, DelayRender semantics, and
an end-to-end HTTP server smoke test."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from easy_gaussian_splatting_tpu.viewer.camera import (
    CameraState,
    DelayRender,
    RecordManager,
    camera_interpolation,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    fov2focal,
    focal2fov,
)
from easy_gaussian_splatting_tpu.viewer.server import Viewer, _orbit_to_camera


class TestSE3:
    def test_so3_roundtrip(self, rng):
        for _ in range(20):
            w = rng.normal(size=3) * 2.0
            R = so3_exp(w)
            # orthonormal
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
            w2 = so3_log(R)
            np.testing.assert_allclose(so3_exp(w2), R, atol=1e-8)

    def test_se3_roundtrip(self, rng):
        for _ in range(20):
            xi = rng.normal(size=6)
            T = se3_exp(xi)
            np.testing.assert_allclose(se3_log(T), xi, atol=1e-8)

    def test_identity(self):
        np.testing.assert_allclose(se3_exp(np.zeros(6)), np.eye(4), atol=1e-12)
        np.testing.assert_allclose(se3_log(np.eye(4)), np.zeros(6), atol=1e-12)

    def test_fov_focal(self):
        f = fov2focal(1.0, 800)
        np.testing.assert_allclose(focal2fov(f, 800), 1.0, atol=1e-10)


def _cam(pos, width=64, height=48):
    w2c = np.eye(4)
    w2c[:3, 3] = -np.asarray(pos, float)
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    return CameraState(w2c, K, width, height)


class TestInterpolation:
    def test_endpoint_preservation(self):
        cams = [_cam([0, 0, 0]), _cam([1, 0, 0]), _cam([1, 1, 0])]
        out = camera_interpolation(cams, duration=2.0, fps=10.0)
        assert len(out) >= 3
        np.testing.assert_allclose(out[0].w2c, cams[0].w2c, atol=1e-9)
        np.testing.assert_allclose(out[-1].w2c, cams[-1].w2c, atol=1e-9)

    def test_frame_count_proportional_to_distance(self):
        cams = [_cam([0, 0, 0]), _cam([3, 0, 0]), _cam([4, 0, 0])]
        out = camera_interpolation(cams, duration=4.0, fps=10.0)
        # segment 1 is 3x the length of segment 2 -> ~3x the frames
        positions = np.array([np.linalg.inv(c.w2c)[:3, 3] for c in out])
        seg1 = np.sum(positions[:, 0] <= 3.0 + 1e-6)
        seg2 = len(out) - seg1
        assert seg1 > 2 * seg2

    def test_too_few_frames_returns_input(self):
        cams = [_cam([0, 0, 0]), _cam([1, 0, 0])]
        out = camera_interpolation(cams, duration=0.1, fps=10.0)
        assert out is cams


class TestDelayRender:
    def test_mailbox_semantics(self):
        rendered = []

        def render(cam):
            rendered.append(cam)
            return np.full((4, 4, 3), 0.5, np.float32)

        dr = DelayRender(render)
        c1, c2 = _cam([0, 0, 0]), _cam([1, 0, 0])
        img = dr.get_render_image(c1)
        assert img.shape[2] == 3  # stale image returned instantly
        assert rendered == []  # nothing rendered yet
        dr.get_render_image(c2)
        dr.update_render_image()
        assert rendered == [c2]  # only the newest deposited camera
        dr.update_render_image()
        assert rendered == [c2]  # mailbox drained

    def test_record_manager(self, tmp_path):
        calls = []

        def render(cam):
            calls.append(1)
            return np.zeros((8, 8, 3), np.float32)

        rm = RecordManager(render, duration=0.5, fps=4.0, output_dir=tmp_path)
        assert rm.export_video() is None  # not enough keyframes
        rm.camera_states = [_cam([0, 0, 0]), _cam([1, 0, 0])]
        path = rm.export_video()
        assert path is not None and path.exists()
        assert len(calls) >= 2


class TestServer:
    def test_http_roundtrip(self):
        def render(cam):
            img = np.zeros((cam.height, cam.width, 3), np.float32)
            img[:, :, 0] = 1.0
            return img

        viewer = Viewer(render, [_cam([0, 0, 3])], port=19981)
        try:
            html = urllib.request.urlopen(
                "http://localhost:19981/", timeout=10
            ).read()
            assert b"viewer" in html
            cams = json.loads(
                urllib.request.urlopen(
                    "http://localhost:19981/cameras", timeout=10
                ).read()
            )
            assert len(cams) == 1
            body = json.dumps(
                dict(yaw=0.3, pitch=0.2, radius=4, target=[0, 0, 0],
                     width=64, height=48)
            ).encode()
            req = urllib.request.Request(
                "http://localhost:19981/render", data=body, method="POST"
            )
            jpeg = urllib.request.urlopen(req, timeout=10).read()
            assert jpeg[:2] == b"\xff\xd8"  # JPEG magic
        finally:
            viewer.stop()

    def test_render_sh_cap_reaches_render_func(self):
        """Interaction degradation: the client's sh_cap payload must
        arrive on the CameraState the render closure sees (the closure
        caps the evaluated SH degree with it while the camera moves)."""
        seen = []

        def render(cam):
            seen.append(getattr(cam, "sh_cap", "missing"))
            return np.zeros((cam.height, cam.width, 3), np.float32)

        viewer = Viewer(render, [_cam([0, 0, 3])], port=19983)
        try:
            for payload in (
                dict(yaw=0.0, pitch=0.0, radius=4, target=[0, 0, 0],
                     width=64, height=48, sh_cap=1),
                dict(yaw=0.0, pitch=0.0, radius=4, target=[0, 0, 0],
                     width=64, height=48),
            ):
                req = urllib.request.Request(
                    "http://localhost:19983/render",
                    data=json.dumps(payload).encode(), method="POST",
                )
                urllib.request.urlopen(req, timeout=10).read()
            assert seen == [1, None]
        finally:
            viewer.stop()

    def test_orbit_camera_looks_at_target(self):
        cam = _orbit_to_camera(
            dict(yaw=0.7, pitch=0.3, radius=5, target=[1, 2, 3],
                 width=64, height=48)
        )
        c2w = np.linalg.inv(cam.w2c)
        pos = c2w[:3, 3]
        fwd = c2w[:3, 2]
        to_target = np.asarray([1, 2, 3]) - pos
        np.testing.assert_allclose(np.linalg.norm(to_target), 5.0, atol=1e-9)
        cos = np.dot(fwd, to_target) / np.linalg.norm(to_target)
        np.testing.assert_allclose(cos, 1.0, atol=1e-9)
        # rotation is orthonormal
        R = cam.w2c[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


class TestParityFeatures:
    """Reference GUI parity: aspect padding, roll rotation, record
    duration/fps plumbing (/root/reference/viewer/viewer_runtime.py:
    104-116, 158-184, and the Export Video folder)."""

    def test_pad_to_aspect(self):
        from easy_gaussian_splatting_tpu.viewer.server import pad_to_aspect

        img = np.ones((48, 64, 3), np.float32)
        wide = pad_to_aspect(img, 2.0)  # pad right
        assert wide.shape == (48, 96, 3)
        np.testing.assert_array_equal(wide[:, :64], img)
        assert wide[:, 64:].max() == 0.0
        tall = pad_to_aspect(img, 1.0)  # pad bottom
        assert tall.shape == (64, 64, 3)
        np.testing.assert_array_equal(tall[:48], img)
        assert tall[48:].max() == 0.0
        same = pad_to_aspect(img, 64 / 48)
        assert same is img

    def test_orbit_camera_roll(self):
        base = dict(
            yaw=0.5, pitch=0.2, radius=4, target=[0, 0, 0],
            width=64, height=48,
        )
        cam0 = _orbit_to_camera(base)
        cam90 = _orbit_to_camera({**base, "roll": np.pi / 2})
        R0 = np.linalg.inv(cam0.w2c)[:3, :3]
        R90 = np.linalg.inv(cam90.w2c)[:3, :3]
        # view axis unchanged, orthonormal
        np.testing.assert_allclose(R0[:, 2], R90[:, 2], atol=1e-9)
        np.testing.assert_allclose(R90 @ R90.T, np.eye(3), atol=1e-9)
        # 90deg roll maps the x axis onto the y axis
        np.testing.assert_allclose(R90[:, 0], R0[:, 1], atol=1e-9)

    def test_render_with_pad_aspect_and_record_params(self, tmp_path):
        sizes = []

        def render(cam):
            sizes.append((cam.height, cam.width))
            return np.zeros((cam.height, cam.width, 3), np.float32)

        viewer = Viewer(
            render, [], port=19982, video_output_dir=tmp_path
        )
        try:
            body = json.dumps(
                dict(yaw=0.0, pitch=0.1, radius=4, target=[0, 0, 0],
                     roll=0.3, width=64, height=48, pad_aspect=2.0)
            ).encode()
            req = urllib.request.Request(
                "http://localhost:19982/render", data=body, method="POST"
            )
            from PIL import Image
            import io

            jpeg = urllib.request.urlopen(req, timeout=10).read()
            im = Image.open(io.BytesIO(jpeg))
            assert im.size == (96, 48)  # padded to aspect 2.0
            assert sizes[-1] == (48, 64)  # rendered at requested size

            # record with explicit duration/fps reaches the manager
            for _ in range(2):
                urllib.request.urlopen(
                    urllib.request.Request(
                        "http://localhost:19982/record/add", data=body,
                        method="POST",
                    ),
                    timeout=10,
                ).read()
            out = json.loads(
                urllib.request.urlopen(
                    urllib.request.Request(
                        "http://localhost:19982/record/export",
                        data=json.dumps(
                            dict(duration=2.0, fps=4)
                        ).encode(),
                        method="POST",
                    ),
                    timeout=30,
                ).read()
            )
            assert viewer.record.duration == 2.0
            assert viewer.record.fps == 4.0
            assert "exported" in out["status"]
        finally:
            viewer.stop()
