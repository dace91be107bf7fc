"""Attribute binning+pack time: key build vs sort vs searchsorted vs pack.

Also prints the tile-count distribution of the bench scene, to size a
two-population (small/overflow) binning layout.

Usage: python scripts/profile_binning.py [N] [H] [W]
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
    _prepare,
    bin_gaussians,
    image_geometry,
    pack_features,
    Binning,
)
from easy_gaussian_splatting_tpu.ops.sh import eval_sh_color
from easy_gaussian_splatting_tpu.training.config import config_from_dict


def timeit(name, f, *a, iters=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3)
    cap = model.capacity
    print(f"N={n} capacity={cap} image={w}x{h}")

    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    isect_cap = -(-int(cfg.isect_mult * cap) // 128) * 128
    params, alive = model.params, model.alive
    geom = image_geometry(h, w, cfg.tile_size)

    @jax.jit
    def proj_all(params):
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

    proj, colors, opac, radii = jax.block_until_ready(proj_all(params))
    m2d, depths = proj.means2d, proj.depths

    # tile-count distribution
    ts = geom.tile_size
    r = np.asarray(radii)
    mm = np.asarray(m2d)
    valid = r > 0
    tx0 = np.clip(np.floor((mm[:, 0] - r) / ts), 0, geom.tiles_x - 1)
    tx1 = np.clip(np.floor((mm[:, 0] + r) / ts), 0, geom.tiles_x - 1)
    ty0 = np.clip(np.floor((mm[:, 1] - r) / ts), 0, geom.tiles_y - 1)
    ty1 = np.clip(np.floor((mm[:, 1] + r) / ts), 0, geom.tiles_y - 1)
    cnt = ((tx1 - tx0 + 1) * (ty1 - ty0 + 1)).astype(int)
    cnt = np.minimum(cnt, 36)[valid]
    print(f"valid={valid.sum()}  total isects={cnt.sum()}")
    for thresh in (1, 2, 4, 6, 9, 12, 16, 25, 36):
        frac = (cnt <= thresh).mean()
        share = cnt[cnt > thresh].sum()
        print(f"  count<={thresh:2d}: {frac*100:5.1f}% of gaussians; "
              f"isects in bigger: {share}")

    t_bin = timeit(
        "bin_gaussians (full)",
        jax.jit(lambda m, r, d: bin_gaussians(m, r, d, geom).isect_orig),
        m2d, radii, depths,
    )

    # key build only (everything before the sort)
    def key_build(m2d, radii, depths):
        c = m2d.shape[0]
        order = jnp.argsort(jnp.where(radii > 0, depths, jnp.inf))
        m2d_s = m2d[order]
        rad = radii[order]
        mx, my = m2d_s[:, 0], m2d_s[:, 1]
        tx0 = jnp.clip(jnp.floor((mx - rad) / ts), 0, geom.tiles_x - 1)
        return tx0.sum()

    t_order = timeit(
        "depth argsort + gather only",
        jax.jit(key_build), m2d, radii, depths,
    )

    # raw big sort cost
    keys = rng.integers(0, 2**27, size=(cap * 36,)).astype(np.int32)
    keys_j = jnp.asarray(keys)
    t_sort36 = timeit(
        "lax.sort 1-op, C*36 keys",
        jax.jit(lambda k: jax.lax.sort(k, is_stable=False)[0]),
        keys_j,
    )
    t_sort4 = timeit(
        "lax.sort 1-op, C*4 keys",
        jax.jit(lambda k: jax.lax.sort(k, is_stable=False)[0]),
        keys_j[: cap * 4],
    )
    t_sortC = timeit(
        "lax.sort 1-op, C keys",
        jax.jit(lambda k: jax.lax.sort(k, is_stable=False)[0]),
        keys_j[:cap],
    )

    # pack_features alone
    binning = jax.jit(
        lambda m, r, d: bin_gaussians(m, r, d, geom)
    )(m2d, radii, depths)
    binning = jax.block_until_ready(binning)
    sliced = Binning(
        order=binning.order,
        isect_orig=binning.isect_orig[:isect_cap],
        isect_tile=binning.isect_tile[:isect_cap],
        tile_offsets=jnp.minimum(binning.tile_offsets, isect_cap),
        num_isects=binning.num_isects,
    )

    def pack_only(m2d, conics, colors, opac):
        g9 = jnp.concatenate([m2d, conics, colors, opac[:, None]], axis=1)
        return pack_features(g9, sliced, geom).sum()

    t_pack = timeit(
        "pack_features (gathers + stack)",
        jax.jit(pack_only), m2d, proj.conics, colors, opac,
    )

    t_prep = timeit(
        "_prepare (full binning+pack)",
        jax.jit(
            lambda m, c_, co, o, r, d: _prepare(
                m, c_, co, o, r, d, h, w, cfg.tile_size,
                cfg.max_tiles, cfg.max_tiles, isect_cap,
            )[2].sum()
        ),
        m2d, proj.conics, colors, opac, radii, depths,
    )

    print()
    print(f"  bin_gaussians:   {t_bin:7.2f}")
    print(f"  (sort C*36 raw:  {t_sort36:7.2f}, C*4: {t_sort4:7.2f}, "
          f"C: {t_sortC:7.2f})")
    print(f"  depth argsort:   {t_order:7.2f}")
    print(f"  pack_features:   {t_pack:7.2f}")
    print(f"  _prepare total:  {t_prep:7.2f}")


if __name__ == "__main__":
    main()
