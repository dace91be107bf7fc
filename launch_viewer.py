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
    if camera_states:
        # the dumped config carries pre-autotune binning defaults;
        # right-size them for this checkpoint (see trainer docs)
        from easy_gaussian_splatting_tpu.training.trainer import (
            tune_inference_cfg,
        )

        c0 = camera_states[0]
        cfg = tune_inference_cfg(
            cfg, state, c0.w2c, c0.K, int(c0.height), int(c0.width)
        )
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    base_px = (
        int(camera_states[0].width) * int(camera_states[0].height)
        if camera_states
        else None
    )
    render_func = make_gs_render_func(
        lambda: state, lambda: sh_degree, background, get_render_fn(cfg),
        cfg=cfg, base_pixels=base_px,
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
