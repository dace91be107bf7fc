"""Blender / nerf_synthetic dataset loader.

Behavioral spec (``/root/reference/scene/blender_loader.py``): parse
``transforms_{train,val,test}.json``; focal from ``camera_angle_x``
(fx = fy = W / (2 tan(fov/2)), principal point at the image center);
convert the OpenGL/Blender camera convention (X right, Y up, Z back) to
OpenCV (X right, Y down, Z forward) by flipping the Y/Z columns of c2w;
masks live in a sibling ``<split>_masks`` directory. Since there is no SfM
point cloud, one is synthesized: 100k uniform points inside the camera
bounding box shrunk to a third around its center, all gray (127).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import List, Tuple

import numpy as np
from PIL import Image

from .types import Frame, Pointcloud

logger = logging.getLogger(__name__)


def load_frames(
    transforms_path: Path,
    use_masks: bool,
    mask_expand_pixels: int,
    white_background: bool,
    suffix: str = ".png",
) -> List[Frame]:
    if not transforms_path.exists():
        raise FileNotFoundError(f"{transforms_path} does not exist")
    with open(transforms_path, "r") as f:
        content = json.load(f)
    fov_x = content["camera_angle_x"]
    frames: List[Frame] = []
    for frame_json in content["frames"]:
        file_name = frame_json["file_path"] + suffix
        image_path = transforms_path.parent / file_name
        mask_dir = image_path.parent.parent / (image_path.parent.name + "_masks")
        mask_path = mask_dir / image_path.name
        with Image.open(image_path) as image:
            width, height = image.size
        fx = fy = width / (2.0 * np.tan(fov_x / 2.0))
        cx, cy = width / 2.0, height / 2.0
        c2w = np.array(frame_json["transform_matrix"], np.float64)
        c2w[:3, 1:3] *= -1  # OpenGL -> OpenCV
        w2c = np.linalg.inv(c2w).astype(np.float32)
        frames.append(
            Frame(
                image_path=image_path,
                mask_path=(
                    mask_path if use_masks and mask_path.exists() else None
                ),
                mask_expand_pixels=mask_expand_pixels,
                width=width,
                height=height,
                fx=fx,
                fy=fy,
                cx=cx,
                cy=cy,
                w2c=w2c,
                white_background=white_background,
            )
        )
    return frames


def generate_pointcloud(frames: List[Frame], num_points: int = 100000) -> Pointcloud:
    """Synthesize an init point cloud: uniform points in the camera bbox
    shrunk to 1/3 about its center, gray RGB 127. Uses the global numpy RNG
    (seeded by the entry point) like the reference."""
    positions = np.stack(
        [np.linalg.inv(f.w2c)[:3, 3] for f in frames], axis=0
    )
    max_val = positions.max()
    min_val = positions.min()
    center = (max_val + min_val) / 2.0
    min_val = center - (center - min_val) / 3.0
    max_val = center + (max_val - center) / 3.0
    xyzs = np.random.rand(num_points, 3) * (max_val - min_val) + min_val
    rgbs = np.full((num_points, 3), 127, np.uint8)
    return Pointcloud(xyzs=xyzs.astype(np.float32), rgbs=rgbs)


def load_blender_data(
    path: str,
    use_masks: bool,
    mask_expand_pixels: int,
    eval: bool,
    eval_in_val: bool,
    eval_in_test: bool,
    white_background: bool,
    init_points: int = 100000,
) -> Tuple[List[Frame], Pointcloud, List[int], List[int]]:
    root = Path(path)
    train_frames = load_frames(
        root / "transforms_train.json",
        use_masks,
        mask_expand_pixels,
        white_background,
    )
    eval_frames: List[Frame] = []
    if eval_in_val:
        eval_frames += load_frames(
            root / "transforms_val.json",
            use_masks,
            mask_expand_pixels,
            white_background,
        )
    if eval_in_test:
        eval_frames += load_frames(
            root / "transforms_test.json",
            use_masks,
            mask_expand_pixels,
            white_background,
        )

    frames = eval_frames + train_frames
    split_point = len(eval_frames)
    indexes = list(range(len(frames)))
    eval_indexes = indexes[:split_point]
    train_indexes = indexes[split_point:] if eval else indexes
    if not eval_indexes:
        logger.warning("no data for evaluation")

    pc = generate_pointcloud(
        frames[split_point:] if eval else frames, num_points=init_points
    )
    return frames, pc, train_indexes, eval_indexes
