"""Fetch-forced stage breakdown of the bench train step.

Each stage is timed as marginal cost over 30->120 chained iterations of a
single jitted fori_loop; the carry perturbs the means each iteration so
neither XLA nor the tunnel can elide work (see profile_sort_gather.py).

Usage: python scripts/profile_step2.py [N] [H] [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.loss import loss_dict
from easy_gaussian_splatting_tpu.ops.projection import (
    CameraIntrinsics,
    project_gaussians,
)
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
    _prepare,
    make_isect_counter,
    rasterize_tiled,
)
from easy_gaussian_splatting_tpu.ops.sh import eval_sh_color
from easy_gaussian_splatting_tpu.training.config import config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    get_render_fn,
    make_train_step,
)
from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state

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
    counter = make_isect_counter(cfg.tile_size, cfg.max_tiles, cfg.max_tiles)
    n_isect = int(np.asarray(counter(model.params, model.alive, w2c, K, height=h, width=w))[0])
    cfg.isect_mult = round(max(0.25, n_isect * 1.3 / model.capacity), 3)
    isect_cap = -(-int(cfg.isect_mult * model.capacity) // 128) * 128
    print(f"N={n} capacity={model.capacity} isect_cap={isect_cap}")
    alive = model.alive
    bg = jnp.ones((3,), jnp.float32)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)

    def stage_proj(params):
        scales = jnp.exp(params.log_scales)
        opac = jax.nn.sigmoid(params.logit_opacities) * alive
        intr = CameraIntrinsics.from_K(K, w, h)
        proj = project_gaussians(params.means, params.quats, scales, w2c, intr)
        dirs = params.means / jnp.maximum(
            jnp.linalg.norm(params.means, axis=-1, keepdims=True), 1e-8
        )
        colors = eval_sh_color(
            3, jnp.concatenate([params.sh_0, params.sh_rest], 1), dirs
        )
        opac = opac * (proj.radii > 0)
        radii = jnp.where(opac > 0.0, proj.radii, 0.0)
        return proj, colors, opac, radii

    def s_proj(params):
        proj, colors, opac, radii = stage_proj(params)
        return proj.means2d.sum() + colors.sum() + radii.sum()

    def s_prepare(params):
        proj, colors, opac, radii = stage_proj(params)
        _, _, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, radii, proj.depths,
            h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles, isect_cap,
        )
        return feats.sum()

    def render_img(params):
        proj, colors, opac, radii = stage_proj(params)
        dummy = jnp.zeros_like(proj.means2d)
        img, alpha = rasterize_tiled(
            proj.means2d, proj.conics, colors, opac, proj.depths, bg,
            dummy, h, w, radii=radii, tile_size=cfg.tile_size,
            max_tiles_w=cfg.max_tiles, max_tiles_h=cfg.max_tiles,
            isect_mult=cfg.isect_mult,
        )
        return img

    def s_forward(params):
        return render_img(params).sum()

    def tsum(tree):
        return sum(jnp.sum(x) for x in jax.tree.leaves(tree))

    def s_fwd_bwd_sum(params):
        g = jax.grad(lambda p: render_img(p).sum())(params)
        return tsum(g)

    def s_fwd_bwd_loss(params):
        def lf(p):
            img = render_img(p)
            return loss_dict(img, image, mask, cfg.lambda_ssim)["total"]
        g = jax.grad(lf)(params)
        return tsum(g)

    timeit("projection+SH fwd", s_proj, model.params)
    timeit("+ binning/pack (_prepare) fwd", s_prepare, model.params)
    timeit("+ fwd kernel + assembly (full fwd)", s_forward, model.params)
    timeit("full fwd + bwd (sum loss)", s_fwd_bwd_sum, model.params)
    timeit("full fwd + bwd (L1+SSIM loss)", s_fwd_bwd_loss, model.params)

    # reference: the real train step
    adam = init_adam_state(model.params)
    step_fn = make_train_step(cfg, get_render_fn(cfg))

    def s_full(params):
        m = model.replace(params=params)
        m2, a2, ld = step_fn(
            m, adam, w2c, K, image, mask,
            np.float32(1e-3), np.bool_(True), np.bool_(False), np.bool_(False),
            height=h, width=w, sh_degree=3,
        )
        return (sum(jnp.sum(x) for x in jax.tree.leaves(m2))
                + sum(jnp.sum(x) for x in jax.tree.leaves(a2))
                + ld["total"])

    # piecewise attribution of the step extras
    from easy_gaussian_splatting_tpu.models.density import update_statistics
    from easy_gaussian_splatting_tpu.models.optimizer import adam_update
    from easy_gaussian_splatting_tpu.training.trainer import LR_GROUPS

    def loss_fn(params, absd):
        proj, colors, opac, radii = stage_proj(params)
        img, alpha = rasterize_tiled(
            proj.means2d, proj.conics, colors, opac, proj.depths, bg,
            absd, h, w, radii=radii, tile_size=cfg.tile_size,
            max_tiles_w=cfg.max_tiles, max_tiles_h=cfg.max_tiles,
            isect_mult=cfg.isect_mult,
        )
        ld = loss_dict(img, image, mask, cfg.lambda_ssim)
        return ld["total"], radii

    def s_absgrad(params):
        absd = jnp.zeros((model.capacity, 2), jnp.float32)
        (_, radii), (g, absg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, absd)
        return tsum(g) + absg.sum()

    timeit("fwd+bwd w/ absgrad channel", s_absgrad, model.params)

    def s_absgrad_stats(params):
        absd = jnp.zeros((model.capacity, 2), jnp.float32)
        (_, radii), (g, absg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, absd)
        st = update_statistics(model.stats, radii, absg, h, w)
        return tsum(g) + tsum(st)

    timeit("+ update_statistics", s_absgrad_stats, model.params)

    def s_absgrad_adam(params):
        absd = jnp.zeros((model.capacity, 2), jnp.float32)
        (_, radii), (g, absg) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, absd)
        lrs = {name: jnp.float32(1e-3) for name in ("means",) + LR_GROUPS}
        skips = {name: jnp.bool_(False) for name in ("means",) + LR_GROUPS}
        p2, a2 = adam_update(params, g, adam, lrs, skips)
        return tsum(p2) + tsum(a2) + absg.sum()

    timeit("+ adam (no stats)", s_absgrad_adam, model.params)

    timeit("FULL train step (loss+densify stats+adam)", s_full, model.params)


if __name__ == "__main__":
    main()
