"""Multi-HOST scaffolding tests: two real OS processes joined via
``jax.distributed.initialize`` over a local coordinator, with collectives
(psum / all_gather / psum_scatter, Gloo CPU backend) crossing the process
boundary — the CPU stand-in for a multi-host TPU pod (SURVEY.md §5.8,
BASELINE's >=2-host scaling target).

Each mode runs ONE sharded train step of the production tiled renderer
across both processes and must reproduce the single-process mesh result
bit-for-tolerance."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(mode: str, devices_per_proc: int):
    port = _free_port()
    env = dict(os.environ)
    env.pop("EGS_TPU_COORDINATOR", None)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/mp_worker.py", mode, str(port),
             str(pid), "2"],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line in worker output:\n{out[-3000:]}"
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results


def _single_process_reference(mode: str):
    """Same step on a single-process mesh of this (8-device) test proc."""
    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import get_render_fn

    H, W = 32, 48
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(60, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
    adam = init_adam_state(model.params)
    K = jnp.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1.0]])
    w2c = jnp.eye(4).at[2, 3].set(4.0)
    image = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    mask = jnp.zeros((H, W))
    cfg = config_from_dict(dict(renderer="tiled", raster_chunk=32))
    render_fn = get_render_fn(cfg)

    if mode == "tiles":
        from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh
        from easy_gaussian_splatting_tpu.parallel.shard import (
            make_sharded_train_step,
        )

        mesh = make_mesh(2)
        step = make_sharded_train_step(cfg, mesh, render_fn, H, W)
    else:
        from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh2d
        from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
            make_gauss_sharded_train_step,
            shard_state,
        )

        mesh = make_mesh2d(2, 2)
        model = shard_state(model, mesh)
        adam = shard_state(adam, mesh)
        step = make_gauss_sharded_train_step(cfg, mesh, render_fn, H, W)

    new_model, _, ld = step(
        model, adam, w2c, K, image, mask,
        np.float32(1e-2), np.bool_(True), np.bool_(False), np.bool_(False),
        sh_degree=1,
    )
    means = np.asarray(new_model.params.means)
    return {
        "loss": float(ld["total"]),
        "isects": float(ld.get("isects", -1.0)),
        "means_sum": float(means.sum()),
        "means_head": [float(v) for v in means[:2].ravel()],
    }


@pytest.mark.parametrize(
    "mode,devices_per_proc", [("tiles", 1), ("gauss2d", 2)]
)
@pytest.mark.slow
def test_two_process_step_matches_single_process(mode, devices_per_proc):
    results = _run_workers(mode, devices_per_proc)
    ref = _single_process_reference(mode)
    for r in results:
        assert r["mode"] == mode
        np.testing.assert_allclose(r["loss"], ref["loss"], rtol=1e-5)
        np.testing.assert_allclose(r["isects"], ref["isects"])
        np.testing.assert_allclose(
            r["means_sum"], ref["means_sum"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            r["means_head"], ref["means_head"], rtol=1e-4, atol=1e-6
        )
    # both processes agree exactly with each other
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["means_sum"] == results[1]["means_sum"]


@pytest.mark.slow
def test_mesh2d_gauss_step_matches_single_device():
    """2-D (gauss, tiles) mesh == monolithic step, single process."""
    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh2d
    from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
        make_gauss_sharded_grad_fn,
        shard_state,
    )
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import (
        get_render_fn,
        make_grad_fn,
    )

    H, W = 32, 48
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(60, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
    K = jnp.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1.0]])
    w2c = jnp.eye(4).at[2, 3].set(4.0)
    image = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    mask = jnp.zeros((H, W))

    # uniform partition: tile-aligned stripes give (near-)bitwise
    # equivalence; the adaptive partition's reassociation band is
    # asserted separately in tests/test_parallel.py
    cfg = config_from_dict(
        dict(
            renderer="tiled", raster_chunk=32,
            stripe_partition="uniform",
        )
    )
    render_fn = get_render_fn(cfg)
    g1, a1, ld1, r1 = make_grad_fn(cfg, render_fn)(
        model, w2c, K, image, mask, height=H, width=W, sh_degree=1
    )
    mesh = make_mesh2d(2, 4)
    smodel = shard_state(model, mesh)
    g2, a2, ld2, r2 = make_gauss_sharded_grad_fn(
        cfg, mesh, render_fn, H, W
    )(smodel, w2c, K, image, mask, sh_degree=1)

    np.testing.assert_allclose(
        float(ld1["total"]), float(ld2["total"]), rtol=1e-6
    )
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for (path, x), y in zip(flat1, flat2):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1e-8)
        np.testing.assert_allclose(
            y, x, atol=5e-4 * scale,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
