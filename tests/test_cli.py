"""CLI end-to-end tests: drive train.py / eval.py as subprocesses on a
tiny procedural scene (CPU), verifying the reference-compatible command
surface, run-directory layout, and the train->eval loop."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["EGS_TPU_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"command {args} failed:\nSTDOUT:\n{proc.stdout[-3000:]}\n"
            f"STDERR:\n{proc.stderr[-3000:]}"
        )
    return proc


@pytest.fixture(scope="module")
def tiny_scene(tmp_path_factory):
    # generated in-process (CPU via conftest)
    from easy_gaussian_splatting_tpu.utils.synthetic import (
        generate_blender_scene,
    )

    root = tmp_path_factory.mktemp("cli")
    data = root / "data"
    generate_blender_scene(
        data, n_train=4, n_test=2, image_size=48, n_gaussians=60
    )
    return root, data


@pytest.mark.slow
def test_train_and_eval_cli(tiny_scene):
    root, data = tiny_scene
    cfg = {
        "data_format": "blender",
        "white_background": True,
        "eval": True,
        "eval_in_test": True,
        "eval_every": 20,
        "eval_render_num": 1,
        "total_iterations": 30,
        "save_model_iterations": [30],
        "sh_degree": 1,
        "sh_degree_interval": 10,
        "refine_start": 5,
        "refine_stop": 20,
        "refine_every": 10,
        "reset_opacities_every": 100,
        "log_every": 10,
        "renderer": "ref",
        "raster_chunk": 64,
        "blender_init_points": 50,
        "dataloader_workers": 0,
    }
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    out = root / "out"

    _run(
        [
            "train.py", "-c", str(cfg_path), "-d", str(data),
            "-o", str(out),
        ],
        cwd=REPO,
    )

    # run-directory layout matches the reference convention
    runs = list((out / "data").iterdir())
    assert len(runs) == 1
    run_dir = runs[0]
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "cameras.json").exists()
    assert (run_dir / "tensorboard").exists()
    assert (run_dir / "checkpoints" / "iterations_30.npz").exists()

    # standalone eval CLI on the run dir
    proc = _run(["eval.py", "-p", str(run_dir)], cwd=REPO)
    assert "evaluation in" in proc.stdout
    assert "psnr=" in proc.stdout


def test_bench_json_contract():
    # bench must print a single valid JSON line with the driver's keys;
    # use a tiny workload override through env to keep CPU runtime sane
    src = (REPO / "bench.py").read_text()
    assert '"metric"' in src and '"vs_baseline"' in src
    # (full bench runs on TPU; here we only verify the contract exists
    # and the module imports)
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "main")
