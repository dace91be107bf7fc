"""Measure interactive viewer frame rates against a checkpoint run dir:
starts the Viewer in-process (same path launch_viewer.py uses, including
compact_for_inference) and times /render round trips for (a) the
full-fidelity idle request and (b) the interaction-degraded request the
client sends while the camera moves (resolution rung + sh_cap=1) at
several rungs. VERDICT-r4 item 8's bar: >= 15 fps during orbit at a
1M+-Gaussian checkpoint.

Usage: python scripts/viewer_fps_probe.py -p RUN_DIR [-i ITER]
"""

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", "-p", required=True)
    ap.add_argument("--iterations", "-i", type=int, default=None)
    ap.add_argument("--port", type=int, default=19984)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.gaussians import (
        compact_for_inference,
    )
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
    n_alive = int(state.num_alive())
    cap0 = state.capacity
    state = compact_for_inference(state)
    print(
        f"{n_alive} alive, capacity {cap0} -> {state.capacity} "
        f"(compact_for_inference)"
    )
    from easy_gaussian_splatting_tpu.training.trainer import (
        tune_inference_cfg,
    )

    cams = load_camera_states(path)
    c0 = cams[0]
    cfg = tune_inference_cfg(
        cfg, state, c0.w2c, c0.K, int(c0.height), int(c0.width)
    )
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    render_func = make_gs_render_func(
        lambda: state, lambda: sh_degree, background, get_render_fn(cfg),
        cfg=cfg, base_pixels=int(c0.width) * int(c0.height),
    )
    viewer = Viewer(
        render_func, cams, port=args.port,
        video_output_dir=Path("/tmp/viewer_probe_videos"),
    )
    try:
        url = f"http://localhost:{args.port}/render"

        def probe(label, height, width, sh_cap=None):
            # distinct orbit angles per frame: the remote-device cache
            # can serve identical (executable, args) dispatches
            times = []
            for k in range(args.frames):
                p = dict(
                    yaw=0.3 + 0.05 * k, pitch=0.25, radius=3.2,
                    target=[0, 0, 0], fov=1.0,
                    width=width, height=height,
                )
                if sh_cap is not None:
                    p["sh_cap"] = sh_cap
                t0 = time.perf_counter()
                req = urllib.request.Request(
                    url, data=json.dumps(p).encode(), method="POST"
                )
                urllib.request.urlopen(req, timeout=120).read()
                times.append(time.perf_counter() - t0)
            # first frame includes jit compile; report the steady tail
            tail = times[2:] if len(times) > 3 else times
            ms = 1e3 * sum(tail) / len(tail)
            print(
                f"{label}: {ms:7.1f} ms/frame ({1e3/ms:5.1f} fps) "
                f"[first {times[0]*1e3:.0f} ms]"
            )
            return ms

        probe("idle  720p full-sh  ", 720, 960)
        probe("orbit 360p sh_cap=1 ", 360, 448, sh_cap=1)
        probe("orbit 180p sh_cap=1 ", 180, 256, sh_cap=1)
    finally:
        viewer.stop()


if __name__ == "__main__":
    main()
