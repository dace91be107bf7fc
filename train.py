"""Training CLI, drop-in equivalent of the reference's
(``/root/reference/train.py:224-250``):

    python train.py -c configs/nerf_synthetic.yaml -d DATA [-o OUT]
                    [--view_online]

Creates ``<output>/<scene>/<timestamp>/``, dumps the resolved config, trains,
then evaluates every saved checkpoint.
"""

import argparse
import logging
from datetime import datetime
from pathlib import Path

from easy_gaussian_splatting_tpu.training.config import (
    dump_config,
    load_config,
)
from easy_gaussian_splatting_tpu.utils.logging import set_global_state

logger = logging.getLogger(__name__)


def parse_cfg(args):
    if not Path(args.data).exists():
        raise FileNotFoundError(f"data does not exist: {args.data}")
    cfg = load_config(
        args.config,
        data=args.data,
        view_online=args.view_online,
    )
    project_name = Path(cfg.data).stem
    stamp = datetime.now().strftime(r"%m-%d_%H-%M-%S")
    cfg.output = str(Path(args.output) / project_name / stamp)
    return cfg


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", type=str, required=True)
    parser.add_argument("--data", "-d", type=str, required=True)
    parser.add_argument("--output", "-o", type=str, default="output")
    parser.add_argument("--view_online", action="store_true")
    parser.add_argument(
        "--resume", type=str, default=None,
        help="checkpoint (.npz with optimizer state) to resume from",
    )
    parser.add_argument(
        "--profile", type=int, default=0,
        help="trace this many training steps with jax.profiler",
    )
    args = parser.parse_args()

    # multi-host: join the process group BEFORE touching any backend
    # (no-op unless EGS_TPU_COORDINATOR / EGS_TPU_DISTRIBUTED is set;
    # launch recipe in parallel/distributed.py)
    from easy_gaussian_splatting_tpu.parallel.distributed import (
        maybe_initialize_from_env,
    )

    maybe_initialize_from_env()

    cfg = parse_cfg(args)
    cfg.profile_steps = args.profile
    set_global_state(cfg.random_seed, cfg.device)

    if cfg.total_iterations not in cfg.save_model_iterations:
        logger.warning(
            "total_iterations is not in save_model_iterations, appending"
        )
        cfg.save_model_iterations.append(cfg.total_iterations)

    logger.info(f"output dir: {cfg.output}")
    Path(cfg.output).mkdir(parents=True)
    dump_config(cfg, Path(cfg.output) / "config.yaml")

    from easy_gaussian_splatting_tpu.training.trainer import train

    logger.info("----------------------- train -----------------------")
    train(cfg, resume_from=args.resume)
    logger.info("training finished")
    logger.info("--------------------- evaluation ---------------------")
    from eval import eval as run_eval

    for iteration in cfg.save_model_iterations:
        run_eval(cfg.output, iteration)


if __name__ == "__main__":
    main()
