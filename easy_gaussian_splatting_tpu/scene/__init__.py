"""Scene/data layer: COLMAP + Blender loaders, frames, point clouds, and the
host-side prefetching pipeline feeding the TPU."""

from .types import Frame, Pointcloud
from .scene import Scene

__all__ = ["Frame", "Pointcloud", "Scene"]
