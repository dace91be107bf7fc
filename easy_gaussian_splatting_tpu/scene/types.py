"""Core data types: point clouds and frames.

Behavioral spec (``/root/reference/scene/data_class.py:8-140``): a
``Pointcloud`` carries xyz/rgb init data; a ``Frame`` is a lazily-loaded
camera view — declared intrinsics + world-to-camera pose (OpenCV convention:
X right, Y down, Z forward) with image/mask paths. ``load()`` produces the
per-step training dict with intrinsics auto-rescaled to the on-disk image
size. ``to_json`` exports the camera for the viewer (``cameras.json``).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

from .image_io import get_downscale_factor, load_image, load_mask


@dataclasses.dataclass
class Pointcloud:
    xyzs: np.ndarray  # [N, 3] float32
    rgbs: np.ndarray  # [N, 3] uint8

    @property
    def nbr_points(self) -> int:
        return int(self.xyzs.shape[0])

    def show(self, show_colors: bool = True, point_size: float = 1.0):
        """Interactive 3D scatter of the point cloud (debug helper; the
        reference uses open3d, unavailable here — matplotlib instead)."""
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        colors = self.rgbs / 255.0 if show_colors else None
        ax.scatter(
            self.xyzs[:, 0], self.xyzs[:, 1], self.xyzs[:, 2],
            c=colors, s=point_size,
        )
        plt.show()
        plt.close(fig)


@dataclasses.dataclass
class Frame:
    image_path: Path
    mask_path: Optional[Path]
    mask_expand_pixels: int
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    w2c: np.ndarray  # [4, 4] float32, OpenCV convention
    white_background: bool

    def load(self) -> Dict[str, Any]:
        """Decode image (+mask), rescale intrinsics to the on-disk size, and
        return the training data dict (all numpy, float32)."""
        image = load_image(self.image_path, self.white_background)
        image = image.astype(np.float32) / 255.0
        height, width = image.shape[:2]

        if self.mask_path is not None:
            mask = load_mask(self.mask_path, self.mask_expand_pixels).astype(
                np.float32
            )
            if mask.shape != image.shape[:2]:
                raise ValueError(
                    f"mask size {mask.shape} != image size {image.shape[:2]}"
                )
        else:
            mask = np.zeros((height, width), np.float32)

        factor = get_downscale_factor(self.height, self.width, height, width)
        K = np.array(
            [
                [self.fx * factor, 0.0, self.cx * factor],
                [0.0, self.fy * factor, self.cy * factor],
                [0.0, 0.0, 1.0],
            ],
            np.float32,
        )
        return {
            "K": K,
            "height": height,
            "width": width,
            "w2c": self.w2c.astype(np.float32),
            "image": image,
            "mask": mask,
        }

    def show_image(self):
        """Debug helper: display the frame's image."""
        import matplotlib.pyplot as plt

        plt.imshow(load_image(self.image_path, self.white_background))
        plt.show()
        plt.close()

    def show_mask(self, alpha: float = 0.6):
        """Debug helper: display the image with the (dilated) mask
        overlaid in red."""
        import matplotlib.pyplot as plt

        if self.mask_path is None:
            raise ValueError("mask_path is None")
        image = load_image(self.image_path, self.white_background).astype(
            np.float32
        )
        mask = load_mask(self.mask_path, self.mask_expand_pixels)[
            ..., None
        ].astype(np.float32)
        color = np.array([220.0, 40.0, 40.0])[None, None]
        a = alpha * mask
        plt.imshow(((1 - a) * image + a * color).astype(np.uint8))
        plt.show()
        plt.close()

    def to_json(self, id: int) -> Dict[str, Any]:
        c2w = np.linalg.inv(self.w2c)
        return {
            "id": id,
            "img_name": self.image_path.stem,
            "width": self.width,
            "height": self.height,
            "position": c2w[:3, 3].tolist(),
            "rotation": c2w[:3, :3].tolist(),
            "fx": self.fx,
            "fy": self.fy,
        }


def quat_to_rotmat_np(quat: np.ndarray) -> np.ndarray:
    """Numpy wxyz quaternion -> rotation matrix (normalizing)."""
    q = np.asarray(quat, np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
