"""Multi-process worker for tests/test_multiprocess.py (not a test).

Launched twice (process_id 0/1); joins a 2-process JAX runtime over a
local coordinator, builds the SAME toy scene as the single-process
reference, runs one sharded train step on a mesh spanning both
processes, and prints one JSON result line. Modes:

- ``tiles``:   2 global devices (1 per process), stripe sharding
- ``gauss2d``: 4 global devices (2 per process), 2-D (gauss, tiles) mesh
               — the ZeRO param all-gather/reduce-scatter crosses the
               process boundary (gauss axis), stripe gathers stay local

Usage: python mp_worker.py <mode> <port> <process_id> <num_processes>
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    mode, port, pid, nprocs = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, ".")  # repo root (tests run from there)
    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.training.config import config_from_dict

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
    from easy_gaussian_splatting_tpu.training.trainer import get_render_fn

    render_fn = get_render_fn(cfg)

    if mode == "tiles":
        from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh
        from easy_gaussian_splatting_tpu.parallel.shard import (
            make_sharded_train_step,
        )

        mesh = make_mesh(2)
        repl = NamedSharding(mesh, P())
        model = jax.device_put(model, repl)
        adam = jax.device_put(adam, repl)
        step = make_sharded_train_step(cfg, mesh, render_fn, H, W)
    elif mode == "gauss2d":
        from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh2d
        from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
            make_gauss_sharded_train_step,
            shard_state,
        )

        mesh = make_mesh2d(2, 2)
        model = shard_state(model, mesh)
        adam = shard_state(adam, mesh)
        step = make_gauss_sharded_train_step(cfg, mesh, render_fn, H, W)
    else:
        raise SystemExit(f"unknown mode {mode}")

    new_model, new_adam, ld = step(
        model, adam, w2c, K, image, mask,
        np.float32(1e-2), np.bool_(True), np.bool_(False), np.bool_(False),
        sh_degree=1,
    )
    from jax.experimental import multihost_utils

    means = np.asarray(
        multihost_utils.process_allgather(new_model.params.means, tiled=True)
    )
    # gauss mode re-gathers sharded params: shape stays [capacity, 3] in
    # tiles mode (replicated) but may concatenate in gauss mode
    means = means.reshape(-1, 3)[: model.params.means.shape[0]]
    print(
        "RESULT "
        + json.dumps(
            {
                "process": pid,
                "mode": mode,
                "loss": float(ld["total"]),
                "isects": float(ld.get("isects", -1.0)),
                "means_sum": float(means.sum()),
                "means_head": [float(v) for v in means[:2].ravel()],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
