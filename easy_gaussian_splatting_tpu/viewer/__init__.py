"""Interactive viewer.

Behavioral spec (``/root/reference/viewer/``): a web viewer over a
``render_func(CameraState) -> ndarray`` closure, fully decoupled from the
model; per-client render loop with static/move/update policies; a training
mode where the *training loop* owns the render cadence via a DelayRender
mailbox; SE3-interpolated camera-path video export.

The reference uses the external ``viser`` package (not available here), so
the server is a dependency-free stdlib HTTP implementation serving a
self-contained orbit-control page; the camera/runtime/recording layers
mirror the reference architecture.
"""

from .camera import CameraState, DelayRender, camera_interpolation
from .server import Viewer

__all__ = ["CameraState", "DelayRender", "camera_interpolation", "Viewer"]
