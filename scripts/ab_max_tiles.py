"""A/B the tile-footprint clamp (docs/PARITY.md deviation 2) on a trained
checkpoint: evaluate the SAME checkpoint's eval split at several
``max_tiles`` settings. Gaussians whose footprint exceeds max_tiles^2
tiles are clamped to a centered window (ops/rasterize_tiled.py); on
unbounded tandt-like layouts huge background Gaussians are exactly where
that bites — if eval PSNR rises with max_tiles, the clamp is a real
quality limiter for that regime (cf. gsplat's unbounded duplication,
`/root/reference/model/gaussian.py:353-367`).

Usage: python scripts/ab_max_tiles.py -p RUN_DIR [-i ITER] [--mt 4 6 8]
"""

import argparse
import logging
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")

logger = logging.getLogger(__name__)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", "-p", required=True)
    ap.add_argument("--iterations", "-i", type=int, default=None)
    ap.add_argument("--mt", type=int, nargs="+", default=[4, 6, 8])
    args = ap.parse_args()

    from easy_gaussian_splatting_tpu.utils.logging import (
        configure_logging,
        set_global_state,
    )

    configure_logging()

    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.evaluation.evaluator import Evaluator
    from easy_gaussian_splatting_tpu.scene.scene import Scene
    from easy_gaussian_splatting_tpu.training.config import load_config
    from easy_gaussian_splatting_tpu.training.trainer import get_render_fn
    from easy_gaussian_splatting_tpu.utils.checkpoint import (
        find_checkpoint,
        load_checkpoint,
    )

    run_dir = Path(args.path)
    cfg = load_config(run_dir / "config.yaml")
    cfg.output = None
    cfg.eval_render_num = 0

    cpt = find_checkpoint(run_dir, args.iterations)
    state, active_sh_degree, step, _ = load_checkpoint(cpt)
    print(f"checkpoint {cpt.name}: {int(state.num_alive())} gaussians")

    # the colmap ratio split shuffles with the global RNG — re-seed per
    # construction so every variant sees the identical eval split
    set_global_state(cfg.random_seed, cfg.device)
    random.seed(cfg.random_seed)
    np.random.seed(cfg.random_seed)
    scene = Scene(
        cfg.data, cfg.data_format, None, cfg.total_iterations, cfg.eval,
        cfg.eval_split_ratio, cfg.eval_in_val, cfg.eval_in_test,
        cfg.use_masks, cfg.mask_expand_pixels, cfg.white_background,
        blender_init_points=cfg.blender_init_points,
    )
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )

    for mt in args.mt:
        cfg.max_tiles = mt
        evaluator = Evaluator(0, get_render_fn(cfg))
        m = evaluator.evaluate(
            scene, "eval", state, active_sh_degree, background,
        )
        print(
            f"max_tiles={mt}: psnr={m['psnr']:.3f} ssim={m['ssim']:.4f} "
            f"latency_device={m.get('latency_device_ms', 0.0):.1f}ms"
        )


if __name__ == "__main__":
    main()
