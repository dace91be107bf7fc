"""Camera state, training-mode mailbox, SE3 interpolation, video export.

Behavioral spec (``/root/reference/viewer/utils.py``):
- ``CameraState``: w2c (OpenCV convention) + intrinsics + size, fov
  helpers, camera-to-camera distance;
- ``DelayRender``: viewer threads deposit the latest requested camera and
  instantly get the stale image; the training loop renders the newest
  deposited camera once per iteration (training owns the device cadence);
- ``camera_interpolation``: SE3 log/exp interpolation between keyframes
  with frame counts proportional to inter-camera distance;
- ``RecordManager``: renders the interpolated path and writes an mp4.

SE3 log/exp are implemented here in numpy (the reference used
viser.transforms, unavailable in this environment).
"""

from __future__ import annotations

import logging
import threading
from datetime import datetime
from pathlib import Path
from typing import Callable, List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * np.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * np.arctan(pixels / (2.0 * focal))


# ----------------------------------------------------------------- SO3/SE3
def so3_exp(w: np.ndarray) -> np.ndarray:
    """Rodrigues: axis-angle [3] -> rotation matrix."""
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        return np.eye(3)
    k = w / theta
    K = np.array(
        [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
    )
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def so3_log(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle [3]."""
    cos_theta = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_theta)
    if theta < 1e-12:
        return np.zeros(3)
    if np.pi - theta < 1e-6:
        # near pi: extract axis from R + I
        A = (R + np.eye(3)) / 2.0
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs from off-diagonals
        if axis[0] > 0:
            axis[1] = np.copysign(axis[1], A[0, 1])
            axis[2] = np.copysign(axis[2], A[0, 2])
        elif axis[1] > 0:
            axis[2] = np.copysign(axis[2], A[1, 2])
        axis = axis / (np.linalg.norm(axis) + 1e-12)
        return theta * axis
    w = (
        theta
        / (2.0 * np.sin(theta))
        * np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
        )
    )
    return w


def _so3_left_jacobian(w: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(w)
    K = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
    )
    if theta < 1e-6:
        return np.eye(3) + 0.5 * K
    K = K / theta
    return (
        np.eye(3)
        + (1 - np.cos(theta)) / theta * K
        + (theta - np.sin(theta)) / theta * (K @ K)
    )


def se3_log(T: np.ndarray) -> np.ndarray:
    """4x4 rigid transform -> twist [6] (rho, w)."""
    w = so3_log(T[:3, :3])
    V = _so3_left_jacobian(w)
    rho = np.linalg.solve(V, T[:3, 3])
    return np.concatenate([rho, w])


def se3_exp(xi: np.ndarray) -> np.ndarray:
    """Twist [6] (rho, w) -> 4x4 rigid transform."""
    rho, w = xi[:3], xi[3:]
    T = np.eye(4)
    T[:3, :3] = so3_exp(w)
    T[:3, 3] = _so3_left_jacobian(w) @ rho
    return T


# ------------------------------------------------------------- camera state
class CameraState:
    def __init__(
        self, w2c: np.ndarray, K: np.ndarray, width: int, height: int
    ) -> None:
        self.w2c = w2c  # OpenCV convention (X right, Y down, Z forward)
        self.K = K
        self.width = width
        self.height = height

    def fov(self) -> Tuple[float, float]:
        return (
            focal2fov(self.K[0, 0], self.width),
            focal2fov(self.K[1, 1], self.height),
        )

    def distance_to(self, other: "CameraState") -> float:
        a = np.linalg.inv(self.w2c)[:3, 3]
        b = np.linalg.inv(other.w2c)[:3, 3]
        return float(np.linalg.norm(a - b))

    def copy(self) -> "CameraState":
        return CameraState(
            self.w2c.copy(), self.K.copy(), self.width, self.height
        )


class DelayRender:
    """Training-mode mailbox: viewer threads deposit cameras and read the
    stale image; the train loop calls update_render_image each iteration."""

    def __init__(self, render_func: Callable[[CameraState], np.ndarray]):
        self.camera_states: List[CameraState] = []
        self.lock = threading.Lock()
        self.render_img = np.ones((720, 1280, 3), np.float32)
        self.render_func = render_func

    def get_render_image(self, camera_state: CameraState) -> np.ndarray:
        with self.lock:
            self.camera_states.append(camera_state)
        return self.render_img

    def update_render_image(self) -> None:
        camera_state = None
        with self.lock:
            if self.camera_states:
                camera_state = self.camera_states[-1]
                self.camera_states.clear()
        if camera_state is not None:
            self.render_img = self.render_func(camera_state)


def camera_interpolation(
    camera_states: List[CameraState], duration: float, fps: float
) -> List[CameraState]:
    """Interpolate a camera path: per-segment frame counts proportional to
    inter-camera distance; poses interpolated on the SE3 manifold."""
    n = len(camera_states)
    total_frames = int(duration * fps)
    if total_frames < n:
        return camera_states

    dists = np.array(
        [
            camera_states[i].distance_to(camera_states[i + 1])
            for i in range(n - 1)
        ]
    )
    denom = dists.sum()
    if denom <= 0:
        return camera_states
    frames_per_seg = dists / denom * total_frames

    base = camera_states[0].copy()
    out: List[CameraState] = [camera_states[0]]
    for i in range(n - 1):
        num = int(frames_per_seg[i])
        if num == 0:
            cam = base.copy()
            cam.w2c = camera_states[i + 1].w2c
            out.append(cam)
            continue
        start_c2w = np.linalg.inv(camera_states[i].w2c)
        end_c2w = np.linalg.inv(camera_states[i + 1].w2c)
        rel = np.linalg.inv(start_c2w) @ end_c2w
        xi = se3_log(rel)
        for j in range(1, num + 1):
            c2w = start_c2w @ se3_exp(xi * j / num)
            cam = base.copy()
            cam.w2c = np.linalg.inv(c2w)
            out.append(cam)
    return out


class RecordManager:
    """Collects keyframe cameras and exports an interpolated-path video."""

    def __init__(
        self,
        render_func: Callable[[CameraState], np.ndarray],
        duration: float,
        fps: float,
        output_dir: Path,
    ) -> None:
        self.render_func = render_func
        self.duration = duration
        self.fps = fps
        self.output_dir = Path(output_dir)
        self.camera_states: List[CameraState] = []

    def export_video(self) -> Path | None:
        import imageio

        if len(self.camera_states) <= 1:
            logger.error("not enough camera states to export video")
            return None
        cams = camera_interpolation(
            self.camera_states, self.duration, self.fps
        )
        frames = []
        for cam in cams:
            img = self.render_func(cam) * 255.0
            frames.append(np.floor(img).astype(np.uint8))
        stamp = datetime.now().strftime(r"%m-%d_%H-%M-%S")
        self.output_dir.mkdir(parents=True, exist_ok=True)
        # mp4 needs an ffmpeg/pyav backend, which this environment may not
        # ship; fall back to GIF so export always works
        try:
            path = self.output_dir / f"{stamp}.mp4"
            imageio.mimsave(path, frames, fps=self.fps)
        except (ValueError, ImportError):
            path = self.output_dir / f"{stamp}.gif"
            imageio.mimsave(path, frames, duration=1.0 / self.fps)
        logger.info(f"exported video to {path}")
        return path
