"""Post-fix decomposition of the 36 ms step: forward kernel vs assembly,
backward kernel vs scatter vs VJP chain. Fetch-forced marginal timing
(see profile_step2.py).

Usage: python scripts/profile_step6.py [N] [H] [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.loss import loss_dict
from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import (
    tiled_backward,
    tiled_forward,
)
from easy_gaussian_splatting_tpu.ops.projection import (
    CameraIntrinsics,
    project_gaussians,
)
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
    _prepare,
    image_geometry,
    image_to_tiles,
    rasterize_tiled,
    tile_pixel_basis,
    tiles_to_image,
)
from easy_gaussian_splatting_tpu.ops.sh import eval_sh_color
from easy_gaussian_splatting_tpu.training.config import config_from_dict

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
    from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import CHUNK

    isect_cap = -(-max(1, int(model.capacity * cfg.isect_mult)) // CHUNK) * CHUNK
    print(f"N={n} capacity={model.capacity} isect_cap={isect_cap}")

    alive = model.alive
    bg = jnp.ones((3,), jnp.float32)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    geom = image_geometry(h, w, cfg.tile_size)
    basis_c = tile_pixel_basis(geom)
    gimg_c = jnp.asarray(
        rng.uniform(size=(geom.num_tiles, 3, cfg.tile_size**2)).astype(
            np.float32
        )
    )
    gt_c = jnp.asarray(
        rng.uniform(size=(geom.num_tiles, cfg.tile_size**2)).astype(np.float32)
    )

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

    def prepared(params):
        proj, colors, opac, radii = stage_proj(params)
        geom_, binning, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, radii, proj.depths,
            h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles, isect_cap,
        )
        return binning, feats

    # 1: binning+pack only (repeat of prof2 for reference)
    def s_prepare(params):
        binning, feats = prepared(params)
        return feats.sum()

    # 2: + forward kernel, NO image assembly
    def s_kernel(params):
        binning, feats = prepared(params)
        rgb_t, tfin_t, last_t = tiled_forward(
            feats, binning.tile_offsets, basis_c, geom.num_tiles,
        )
        return rgb_t.sum() + tfin_t.sum()

    # 3: + assembly (tiles_to_image + blend) == full fwd
    def s_fwd(params):
        binning, feats = prepared(params)
        rgb_t, tfin_t, last_t = tiled_forward(
            feats, binning.tile_offsets, basis_c, geom.num_tiles,
        )
        img = tiles_to_image(rgb_t, geom, h, w)
        final_t = tiles_to_image(tfin_t[..., None], geom, h, w)[..., 0]
        img = img + final_t[..., None] * bg[None, None, :]
        return img.sum()

    # 4: fwd kernel + bwd kernel with constant cotangents (no assembly,
    # no scatter)
    def s_bwd_kernel(params):
        binning, feats = prepared(params)
        rgb_t, tfin_t, last_t = tiled_forward(
            feats, binning.tile_offsets, basis_c, geom.num_tiles,
        )
        dfeats = tiled_backward(
            feats, binning.tile_offsets, basis_c, gimg_c, gt_c,
            tfin_t, last_t,
        )
        return dfeats.sum()

    # 5a..5d: the flat-sorted segmented reduction, piecewise (dfeats is
    # ROW-major [I_pad, 128], lanes 0..10 live — see tile_raster.py)
    def _bwd_dfeats(params):
        binning, feats = prepared(params)
        rgb_t, tfin_t, last_t = tiled_forward(
            feats, binning.tile_offsets, basis_c, geom.num_tiles,
        )
        dfeats = tiled_backward(
            feats, binning.tile_offsets, basis_c, gimg_c, gt_c,
            tfin_t, last_t,
        )
        return binning, dfeats

    def s_red_sort(params):
        binning, dfeats = _bwd_dfeats(params)
        icap = binning.isect_flat.shape[0]
        flat_asc, perm = jax.lax.sort(
            (binning.isect_flat, jnp.arange(icap, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        return dfeats.sum() + flat_asc.sum() + perm.sum()

    def s_red_gather(params):
        binning, dfeats = _bwd_dfeats(params)
        icap = binning.isect_flat.shape[0]
        flat_asc, perm = jax.lax.sort(
            (binning.isect_flat, jnp.arange(icap, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        rows = dfeats[:icap, :12][perm]
        return rows.sum() + flat_asc.sum()

    def s_red_scan(params):
        binning, dfeats = _bwd_dfeats(params)
        icap = binning.isect_flat.shape[0]
        m = cfg.max_tiles * cfg.max_tiles
        flat_asc, perm = jax.lax.sort(
            (binning.isect_flat, jnp.arange(icap, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        rows = dfeats[:icap, :12][perm]
        rt = jnp.swapaxes(rows, 0, 1)
        g = flat_asc // m
        k = 1
        while k < m:
            g_ahead = jnp.concatenate([g[k:], jnp.full((k,), -1, jnp.int32)])
            same = (g_ahead == g)[None, :]
            rt_ahead = jnp.concatenate(
                [rt[:, k:], jnp.zeros((rt.shape[0], k), rt.dtype)], axis=1
            )
            rt = rt + jnp.where(same, rt_ahead, 0.0)
            k *= 2
        return rt.sum()

    def s_red_full(params):
        binning, dfeats = _bwd_dfeats(params)
        icap = binning.isect_flat.shape[0]
        m = cfg.max_tiles * cfg.max_tiles
        flat_asc, perm = jax.lax.sort(
            (binning.isect_flat, jnp.arange(icap, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        )
        rows = dfeats[:icap, :12][perm]
        rt = jnp.swapaxes(rows, 0, 1)
        g = flat_asc // m
        k = 1
        while k < m:
            g_ahead = jnp.concatenate([g[k:], jnp.full((k,), -1, jnp.int32)])
            same = (g_ahead == g)[None, :]
            rt_ahead = jnp.concatenate(
                [rt[:, k:], jnp.zeros((rt.shape[0], k), rt.dtype)], axis=1
            )
            rt = rt + jnp.where(same, rt_ahead, 0.0)
            k *= 2
        sums = jnp.swapaxes(rt, 0, 1)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(binning.counts)[:-1]]
        )
        dsum = sums[jnp.minimum(starts, icap - 1)]
        return dsum.sum()

    # 6: full fwd+bwd via the custom VJP (sum loss) — adds image cotangent
    # tiling + pack/projection/SH VJPs over (4)+(5)
    def s_full_vjp(params):
        def f(p):
            proj, colors, opac, radii = stage_proj(p)
            img, alpha = rasterize_tiled(
                proj.means2d, proj.conics, colors, opac, proj.depths, bg,
                jnp.zeros_like(proj.means2d), h, w, radii=radii,
                tile_size=cfg.tile_size, max_tiles_w=cfg.max_tiles,
                max_tiles_h=cfg.max_tiles, isect_mult=cfg.isect_mult,
            )
            return img.sum()
        g = jax.grad(f)(params)
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))

    timeit("1 binning+pack fwd", s_prepare, model.params)
    timeit("2 + fwd kernel (no assembly)", s_kernel, model.params)
    timeit("3 + assembly (full fwd)", s_fwd, model.params)
    timeit("4 (2) + bwd kernel (const cotangents)", s_bwd_kernel, model.params)
    timeit("5a (4) + flat sort", s_red_sort, model.params)
    timeit("5b (5a) + [p] row gather", s_red_gather, model.params)
    timeit("5c (5b) + segmented scan", s_red_scan, model.params)
    timeit("5d (5c) + starts gather (full reduction)", s_red_full, model.params)
    timeit("6 full fwd+bwd custom VJP (sum loss)", s_full_vjp, model.params)


if __name__ == "__main__":
    main()
