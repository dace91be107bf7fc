"""Fetch-forced marginal decomposition of binning+pack (the 9.3 ms stage).

Stages (cumulative): projection+SH -> +key build/exact test -> +sort ->
+offsets -> +g9 gather -> full pack+pad. See profile_step2.py for the
timing method (chained fori_loop, distinct seeds, marginal over iters).

Usage: python scripts/profile_binning2.py [N] [H] [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.ops.projection import (
    CameraIntrinsics,
    project_gaussians,
)
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
    Binning,
    _prepare,
    bin_gaussians,
    binning_extents,
    image_geometry,
    pack_features,
)
from easy_gaussian_splatting_tpu.ops.rasterize_ref import ALPHA_THRESH
from easy_gaussian_splatting_tpu.ops.sh import eval_sh_color
from easy_gaussian_splatting_tpu.training.config import config_from_dict

ITERS = (10, 40)


def timeit(name, stage, params0):
    def make(iters):
        @jax.jit
        def run(seed, params):
            def body(i, p):
                out = stage(p)
                bump = (
                    out.reshape(-1)[0].astype(jnp.float32) * 0.0
                    + seed.astype(jnp.float32) * 1e-30
                )
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
    print(f"{name:52s} {dt:8.2f} ms")
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
    geom = image_geometry(h, w, cfg.tile_size)
    ts = cfg.tile_size
    m = cfg.max_tiles * cfg.max_tiles
    num_tiles = geom.num_tiles
    tx_n, ty_n = geom.tiles_x, geom.tiles_y
    c = model.capacity

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

    def keys_build(params):
        """Everything bin_gaussians does BEFORE the sort; returns the
        packed key matrix + origs (mirrors rasterize_tiled.bin_gaussians)."""
        proj, colors, opac, radii = stage_proj(params)
        means2d, depths, conics = proj.means2d, proj.depths, proj.conics
        extents = binning_extents(conics, opac, radii)
        valid = (extents[:, 0] > 0.0) & (extents[:, 1] > 0.0)
        order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
        rank = jnp.argsort(order)
        rx, ry = extents[:, 0], extents[:, 1]
        mx, my = means2d[:, 0], means2d[:, 1]
        tx0 = jnp.clip(jnp.floor((mx - rx) / ts), 0, tx_n - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((mx + rx) / ts), 0, tx_n - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((my - ry) / ts), 0, ty_n - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((my + ry) / ts), 0, ty_n - 1).astype(jnp.int32)
        cx = jnp.clip(jnp.floor(mx / ts).astype(jnp.int32), tx0, tx1)
        cy = jnp.clip(jnp.floor(my / ts).astype(jnp.int32), ty0, ty1)
        ww = jnp.minimum(tx1 - tx0 + 1, m)
        hh = jnp.minimum(ty1 - ty0 + 1, m)
        over = ww * hh > m
        shrink_w = over & (ww >= hh)
        ww = jnp.where(shrink_w, jnp.maximum(m // hh, 1), ww)
        hh = jnp.where(over & ~shrink_w, jnp.maximum(m // ww, 1), hh)
        tx0 = jnp.clip(cx - (ww - 1) // 2, tx0, tx1 - ww + 1)
        ty0 = jnp.clip(cy - (hh - 1) // 2, ty0, ty1 - hh + 1)
        count = jnp.where(valid, ww * hh, 0)
        j = jnp.arange(m, dtype=jnp.int32)[None, :]
        w_safe = jnp.maximum(ww, 1)[:, None]
        jy = j // w_safe
        jx = j % w_safe
        tile = (ty0[:, None] + jy) * tx_n + tx0[:, None] + jx
        live = (j < count[:, None]) & valid[:, None]
        a = conics[:, 0:1]
        b = conics[:, 1:2]
        cc2 = conics[:, 2:3]
        s_max = jnp.log(jnp.maximum(opac, 1e-12) / ALPHA_THRESH)
        s_max = jnp.clip(s_max, 0.0, 4.5)[:, None]
        x0 = ((tx0[:, None] + jx) * ts).astype(jnp.float32) - mx[:, None]
        y0 = ((ty0[:, None] + jy) * ts).astype(jnp.float32) - my[:, None]
        x1 = x0 + ts
        y1 = y0 + ts
        a_safe = jnp.maximum(a, 1e-12)
        c_safe = jnp.maximum(cc2, 1e-12)

        def sig(dx, dy):
            return 0.5 * a * dx * dx + 0.5 * cc2 * dy * dy + b * dx * dy

        def edge_x(xe):
            return sig(xe, jnp.clip(-b * xe / c_safe, y0, y1))

        def edge_y(ye):
            return sig(jnp.clip(-b * ye / a_safe, x0, x1), ye)

        s_edge = jnp.minimum(
            jnp.minimum(edge_x(x0), edge_x(x1)),
            jnp.minimum(edge_y(y0), edge_y(y1)),
        )
        inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
        s_min = jnp.where(inside, 0.0, s_edge)
        live = live & (s_min <= s_max)
        keys = jnp.where(live, tile, num_tiles).astype(jnp.int32)
        origs = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[:, None], (c, m))
        rank_bits = max(1, (c - 1).bit_length())
        packed = (keys << rank_bits) | rank[:, None]
        return packed, origs, rank_bits, proj, colors, opac, radii

    def s_keys(params):
        packed, origs, *_ = keys_build(params)
        return packed

    def s_sort(params):
        packed, origs, rank_bits, *_ = keys_build(params)
        sp, so = jax.lax.sort(
            (packed.reshape(-1), origs.reshape(-1)), num_keys=1,
            is_stable=False,
        )
        return sp

    def s_offsets(params):
        packed, origs, rank_bits, *_ = keys_build(params)
        sp, so = jax.lax.sort(
            (packed.reshape(-1), origs.reshape(-1)), num_keys=1,
            is_stable=False,
        )
        sk = (sp >> rank_bits).astype(jnp.int32)
        offs = jnp.searchsorted(
            sk, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
        return offs

    def s_gather(params):
        packed, origs, rank_bits, proj, colors, opac, radii = keys_build(params)
        sp, so = jax.lax.sort(
            (packed.reshape(-1), origs.reshape(-1)), num_keys=1,
            is_stable=False,
        )
        g9 = jnp.concatenate(
            [proj.means2d, proj.conics, colors, opac[:, None]], axis=1
        )
        gi = g9[so[:isect_cap]]
        return gi

    def s_full(params):
        proj, colors, opac, radii = stage_proj(params)
        geom_, binning, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, radii, proj.depths,
            h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles, isect_cap,
        )
        return feats

    def s_proj_only(params):
        proj, colors, opac, radii = stage_proj(params)
        return proj.means2d

    timeit("0 proj+SH only", s_proj_only, model.params)
    timeit("1 + key build/exact test (no sort)", s_keys, model.params)
    timeit("2 + packed sort", s_sort, model.params)
    timeit("3 + searchsorted offsets", s_offsets, model.params)
    timeit("4 (2) + g9 gather", s_gather, model.params)
    timeit("5 full prepare (pack+pad)", s_full, model.params)


if __name__ == "__main__":
    main()
