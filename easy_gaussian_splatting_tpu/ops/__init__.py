"""Pure-function compute ops: quaternions, spherical harmonics, EWA projection,
rasterization (oracle + tiled Pallas), SSIM, k-NN, LR schedules."""

from .quaternion import normalized_quat_to_rotmat, quat_to_rotmat
from .sh import eval_sh, rgb_to_sh0, sh0_to_rgb, num_sh_bases
from .lr_schedule import log_lerp_schedule
from .projection import project_gaussians, CameraIntrinsics

__all__ = [
    "normalized_quat_to_rotmat",
    "quat_to_rotmat",
    "eval_sh",
    "rgb_to_sh0",
    "sh0_to_rgb",
    "num_sh_bases",
    "log_lerp_schedule",
    "project_gaussians",
    "CameraIntrinsics",
]
