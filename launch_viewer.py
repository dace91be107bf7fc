"""Offline viewer CLI, equivalent of the reference's
(``/root/reference/launch_viewer.py``):

    python launch_viewer.py -p OUTPUT_DIR [-i ITERATIONS]
"""

import argparse
import time
from pathlib import Path


def waiting_exit():
    print("viewer is running, press Ctrl+C to exit")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", "-p", type=str, required=True)
    parser.add_argument("--iterations", "-i", type=int, default=None)
    parser.add_argument("--port", type=int, default=9981)
    args = parser.parse_args()

    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.training.config import load_config
    from easy_gaussian_splatting_tpu.training.trainer import get_render_fn
    from easy_gaussian_splatting_tpu.utils.checkpoint import (
        find_checkpoint,
        load_checkpoint,
    )
    from easy_gaussian_splatting_tpu.utils.logging import configure_logging
    from easy_gaussian_splatting_tpu.viewer.integration import (
        load_camera_states,
        make_gs_render_func,
    )
    from easy_gaussian_splatting_tpu.viewer.server import Viewer

    configure_logging()
    path = Path(args.path)
    cfg = load_config(path / "config.yaml")
    state, sh_degree, _, _ = load_checkpoint(
        find_checkpoint(path, args.iterations)
    )
    from easy_gaussian_splatting_tpu.models.gaussians import (
        compact_for_inference,
    )

    state = compact_for_inference(state)
    camera_states = load_camera_states(path)
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    render_func = make_gs_render_func(
        lambda: state, lambda: sh_degree, background, get_render_fn(cfg)
    )
    Viewer(
        render_func,
        camera_states,
        port=args.port,
        video_output_dir=path / "videos",
    )
    waiting_exit()


if __name__ == "__main__":
    main()
