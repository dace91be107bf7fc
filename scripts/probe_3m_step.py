"""Stage-by-stage localization of the 3M-Gaussian full-step crash.

Replicates bench.py's 3M point setup exactly, but runs it in stages so
the faulting stage is identifiable:
  counter  -- isect counter only (binning via the production impl)
  fwd      -- jitted forward render + loss (no backward)
  grad     -- forward + backward (pre-Adam gradients)
  step     -- the full train step (what bench times)
Usage: python scripts/probe_3m_step.py <stage> [n]
Env:   EGS_TPU_BINNING=xla|pallas, EGS_TPU_BWD_REDUCE=scan|pallas|dense
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "step"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    h = w = 800

    import jax
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.gaussians import (
        _round_up_capacity,
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.models.render import CameraView
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        BUDGET_CANDIDATES,
        _ov_capacity,
        make_isect_counter,
        max_isect_cap,
    )
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import (
        get_render_fn,
        make_grad_fn,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    capacity = None if n < 2_000_000 else _round_up_capacity(int(n * 1.05))
    t0 = time.time()
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3, capacity=capacity)
    adam = init_adam_state(model.params)
    print(f"init: capacity={model.capacity} ({time.time()-t0:.1f}s)",
          flush=True)
    cfg = config_from_dict(
        dict(renderer="tiled", white_background=True, tile_size=32)
    )
    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)

    counter = make_isect_counter(cfg.tile_size, cfg.max_tiles, cfg.max_tiles)
    vals = np.asarray(
        counter(model.params, model.alive, w2c, K, height=h, width=w)
    )
    n_isect = int(vals[0])
    print(f"counter: isects={n_isect} overflow={int(vals[1])} "
          f"n_gt={vals[2:].tolist()}", flush=True)
    if stage == "counter":
        return

    cap_lim = max_isect_cap(cfg.isect_hbm_budget_mb)
    import math

    cfg.isect_mult = (
        math.floor(
            min(max(0.25, n_isect * 1.2 / model.capacity),
                cap_lim / model.capacity) * 1e3
        ) / 1e3
    )
    m_cells = cfg.max_tiles * cfg.max_tiles
    best_dom = None
    for bb, need in zip(BUDGET_CANDIDATES, vals[2:]):
        if bb >= m_cells:
            continue
        ovf = round(max(0.01, min(1.0, int(need) * 2.0 / model.capacity)), 3)
        dom = model.capacity * bb + m_cells * _ov_capacity(
            model.capacity, ovf
        )
        if best_dom is None or dom < best_dom:
            cfg.small_budget, cfg.ov_frac, best_dom = bb, ovf, dom
    print(f"tuned: isect_mult={cfg.isect_mult} small_budget="
          f"{cfg.small_budget} ov_frac={cfg.ov_frac} "
          f"icap={int(model.capacity * cfg.isect_mult):,}", flush=True)

    render_fn = get_render_fn(cfg)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    background = jnp.ones((3,), jnp.float32)

    if stage == "fwd":
        @jax.jit
        def fwd(params, alive, w2c, K):
            camera = CameraView(w2c=w2c, K=K, width=w, height=h)
            absd = jnp.zeros((params.means.shape[0], 2), jnp.float32)
            out = render_fn(
                params, alive, camera, 3, background, absd
            )
            return out.image.sum()

        t0 = time.time()
        v = float(fwd(model.params, model.alive, w2c, K))
        print(f"fwd: sum={v:.3f} ({time.time()-t0:.1f}s)", flush=True)
        return

    if stage == "grad":
        gf = make_grad_fn(cfg, render_fn)
        t0 = time.time()
        grads, absgrad, ld, radii = gf(
            model, w2c, K, image, mask, height=h, width=w, sh_degree=3
        )
        v = float(np.asarray(grads.means[0, 0])) + float(ld["total"])
        print(f"grad: probe={v:.5f} ({time.time()-t0:.1f}s)", flush=True)
        return

    step_fn = make_train_step(cfg, render_fn)
    t0 = time.time()
    model, adam, ld = step_fn(
        model, adam, w2c, K, image, mask,
        np.float32(1e-3), np.bool_(True), np.bool_(False), np.bool_(False),
        height=h, width=w, sh_degree=3,
    )
    v = float(np.asarray(model.params.means[0, 0])) + float(ld["total"])
    print(f"step: probe={v:.5f} ({time.time()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        model, adam, ld = step_fn(
            model, adam, w2c, K, image, mask,
            np.float32(1e-3), np.bool_(True), np.bool_(False),
            np.bool_(False),
            height=h, width=w, sh_degree=3,
        )
    float(np.asarray(model.params.means[0, 0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"step timing: {dt*1e3:.2f} ms ({1.0/dt:.2f} it/s)", flush=True)


if __name__ == "__main__":
    main()
