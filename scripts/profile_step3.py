"""Bisect the gap between the piecewise stage costs (profile_step2) and
the full jitted train step: reproduce make_train_step's internals exactly,
adding one piece at a time. Same fetch-forced marginal timing method.

Usage: python scripts/profile_step3.py [N] [H] [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import (
    GaussianModelState,
    init_gaussian_state,
)
from easy_gaussian_splatting_tpu.models.loss import loss_dict
from easy_gaussian_splatting_tpu.models.optimizer import (
    adam_update,
    init_adam_state,
)
from easy_gaussian_splatting_tpu.models.density import update_statistics
from easy_gaussian_splatting_tpu.models.render import CameraView
from easy_gaussian_splatting_tpu.training.config import config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    LR_GROUPS,
    get_render_fn,
)

ITERS = (10, 40)


def timeit(name, stage, params0):
    def make(iters):
        @jax.jit
        def run(seed, params):
            def body(i, p):
                out = stage(p)
                bump = (out * 0.0 + seed.astype(jnp.float32) * 1e-30)
                return p.replace(means=p.means + bump)
            p = jax.lax.fori_loop(0, iters, body, params)
            return p.means.reshape(-1)[:8]
        return run

    walls = {}
    for iters in ITERS:
        run = make(iters)
        np.asarray(run(jnp.int32(0), params0))
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(1), params0))
        walls[iters] = time.perf_counter() - t0
    dt = (walls[ITERS[1]] - walls[ITERS[0]]) / (ITERS[1] - ITERS[0]) * 1e3
    print(f"{name:46s} {dt:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        make_isect_counter,
    )

    counter = make_isect_counter(cfg.tile_size, cfg.max_tiles, cfg.max_tiles)
    n_isect = int(np.asarray(counter(model.params, model.alive, w2c, K, height=h, width=w))[0])
    cfg.isect_mult = round(max(0.25, n_isect * 1.3 / model.capacity), 3)
    print(f"N={n} capacity={model.capacity} isect_mult={cfg.isect_mult}")

    render_fn = get_render_fn(cfg)
    background = jnp.ones((3,), jnp.float32)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    camera = CameraView(w2c=w2c, K=K, width=w, height=h)
    capacity = model.capacity
    alive = model.alive
    adam = init_adam_state(model.params)
    sh_degree = 3

    def tsum(tree):
        return sum(jnp.sum(x) for x in jax.tree.leaves(tree))

    # A: render_fn fwd only
    def s_render(params):
        absd = jnp.zeros((capacity, 2), jnp.float32)
        out = render_fn(params, alive, camera, sh_degree, background, absd)
        return out.image.sum()

    # B: render + loss grad (exact train_step loss_fn)
    def make_loss_fn(clip=True):
        def loss_fn(params, absd):
            out = render_fn(
                params, alive, camera, sh_degree, background, absd
            )
            ld = loss_dict(out.image, image, mask, cfg.lambda_ssim)
            return ld["total"], (ld, out.radii)
        return loss_fn

    loss_fn = make_loss_fn()

    def s_grad(params):
        absd = jnp.zeros((capacity, 2), jnp.float32)
        (_, (ld, radii)), (g, absg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, absd)
        return tsum(g) + absg.sum()

    # C: + stats where
    def s_stats(params):
        absd = jnp.zeros((capacity, 2), jnp.float32)
        (_, (ld, radii)), (g, absg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, absd)
        new_stats = update_statistics(model.stats, radii, absg, h, w)
        stats = jax.tree.map(
            lambda a, b: jnp.where(jnp.bool_(True), b, a),
            model.stats, new_stats,
        )
        return tsum(g) + tsum(stats)

    # D: + adam with traced skips
    def s_adam(params):
        absd = jnp.zeros((capacity, 2), jnp.float32)
        (_, (ld, radii)), (g, absg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, absd)
        new_stats = update_statistics(model.stats, radii, absg, h, w)
        stats = jax.tree.map(
            lambda a, b: jnp.where(jnp.bool_(True), b, a),
            model.stats, new_stats,
        )
        lrs = {name: jnp.float32(1e-3) for name in ("means",) + LR_GROUPS}
        skips = {name: jnp.bool_(False) for name in ("means",) + LR_GROUPS}
        p2, a2 = adam_update(params, g, adam, lrs, skips)
        return tsum(p2) + tsum(a2) + tsum(stats)

    timeit("A render_fn fwd", s_render, model.params)
    timeit("B render_fn fwd+bwd (L1+SSIM)", s_grad, model.params)
    timeit("C + stats", s_stats, model.params)
    timeit("D + adam (full step body)", s_adam, model.params)


if __name__ == "__main__":
    main()
