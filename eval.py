"""Evaluation CLI, equivalent of the reference's
(``/root/reference/eval.py:76-154``):

    python eval.py -p OUTPUT_DIR [-i ITERATIONS]

Re-reads the run's resolved ``config.yaml``, re-seeds so the train/eval
split reproduces, loads the checkpoint (max iteration unless named), and
evaluates PSNR/SSIM/LPIPS/FPS on BOTH the (deduplicated) train set and the
eval set.
"""

import argparse
import logging
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)


def eval(training_output_path: str, iterations: Optional[int] = None):
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.evaluation.evaluator import Evaluator
    from easy_gaussian_splatting_tpu.scene.scene import Scene
    from easy_gaussian_splatting_tpu.training.config import load_config
    from easy_gaussian_splatting_tpu.training.trainer import get_render_fn
    from easy_gaussian_splatting_tpu.utils.checkpoint import (
        find_checkpoint,
        load_checkpoint,
    )
    from easy_gaussian_splatting_tpu.utils.logging import set_global_state

    run_dir = Path(training_output_path)
    cfg = load_config(run_dir / "config.yaml")
    set_global_state(cfg.random_seed, cfg.device)
    cfg.output = None
    cfg.eval_render_num = 0

    cpt = find_checkpoint(run_dir, iterations)
    logger.info(f"load checkpoint from {cpt}")
    state, active_sh_degree, step, _ = load_checkpoint(cpt)
    logger.info(f"nbr_gaussians: {int(state.num_alive())}")
    from easy_gaussian_splatting_tpu.models.gaussians import (
        compact_for_inference,
    )

    # forward-only: drop dead capacity slots (20-30% render latency at
    # typical end-of-training occupancy; outputs identical)
    state = compact_for_inference(state)

    scene = Scene(
        cfg.data,
        cfg.data_format,
        None,
        cfg.total_iterations,
        cfg.eval,
        cfg.eval_split_ratio,
        cfg.eval_in_val,
        cfg.eval_in_test,
        cfg.use_masks,
        cfg.mask_expand_pixels,
        cfg.white_background,
        blender_init_points=cfg.blender_init_points,
    )
    # evaluate each train image once
    scene.train_indexes = list(set(scene.train_indexes))

    # the dumped config carries pre-autotune binning defaults; right-size
    # them for this checkpoint from one probe frame (see trainer docs)
    from easy_gaussian_splatting_tpu.training.trainer import (
        tune_inference_cfg,
    )

    split0 = "eval" if scene.nbr_data("eval") > 0 else "train"
    d0 = scene.get_data(split0, 0)
    cfg = tune_inference_cfg(
        cfg, state, d0["w2c"], d0["K"], d0["height"], d0["width"]
    )

    evaluator = Evaluator(cfg.eval_render_num, get_render_fn(cfg))
    background = jnp.full(
        (3,), 1.0 if cfg.white_background else 0.0, jnp.float32
    )
    for set_name, split in [("train set", "train"), ("eval set", "eval")]:
        if scene.nbr_data(split) == 0:
            logger.info(f"{set_name} is empty, skip evaluation")
            continue
        cache = None
        if cfg.data_device_cache:
            from easy_gaussian_splatting_tpu.scene.device_cache import (
                build_cache,
            )

            cache = build_cache(scene, split, cfg.data_device_cache_mb)
        m = evaluator.evaluate(
            scene, split, state, active_sh_degree, background,
            num_workers=cfg.dataloader_workers, cache=cache,
        )
        lpips_tag = (
            "lpips" if evaluator.lpips.kind == "vgg" else "lpips_proxy"
        )
        logger.info(
            f"evaluation in {set_name:>10s}: psnr={m['psnr']:6.3f}, "
            f"ssim={m['ssim']:6.3f}, {lpips_tag}={m[lpips_tag]:6.3f}, "
            f"fps={m['fps']:6.3f}, "
            f"latency={m.get('latency_ms', 0.0):6.1f}ms, "
            f"device_latency={m.get('latency_device_ms', 0.0):6.1f}ms"
        )


if __name__ == "__main__":
    from easy_gaussian_splatting_tpu.utils.logging import configure_logging

    configure_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("--path", "-p", type=str, required=True)
    parser.add_argument("--iterations", "-i", type=int, default=None)
    args = parser.parse_args()
    eval(args.path, args.iterations)
