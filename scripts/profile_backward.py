"""Fine-grained attribution of the backward chain on the attached chip.

Times, in isolation: the Pallas backward kernel, the per-Gaussian
scatter-add reduction, the unsort scatters, and the projection/feature VJPs
— so backward optimization effort goes where the time actually is.

Usage: python scripts/profile_backward.py [N] [H] [W]
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
    image_geometry,
    image_to_tiles,
    tile_pixel_basis,
)
from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import (
    tiled_backward,
    tiled_forward,
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
    basis = tile_pixel_basis(geom)

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

    @jax.jit
    def make_residuals(params):
        proj, colors, opac, radii = stage_proj(params)
        geom_, binning, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, radii, proj.depths,
            h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles, isect_cap,
        )
        rgb_t, tfin_t, last_t = tiled_forward(
            feats, binning.tile_offsets, basis, geom.num_tiles
        )
        return binning, feats, tfin_t, last_t

    binning, feats, tfin_t, last_t = jax.block_until_ready(
        make_residuals(params)
    )
    g_img = jnp.ones((h, w, 3), jnp.float32)
    g_t = jnp.ones((h, w), jnp.float32)
    gimg_t = jnp.swapaxes(image_to_tiles(g_img, geom, h, w), 1, 2)
    gt_t = image_to_tiles(g_t, geom, h, w)

    # 1. backward kernel alone
    t_kern = timeit(
        "bwd Pallas kernel",
        jax.jit(
            lambda f, o, gi, gt, tf, la: tiled_backward(
                f, o, basis, gi, gt, tf, la
            ).sum()
        ),
        feats, binning.tile_offsets, gimg_t, gt_t, tfin_t, last_t,
    )

    dfeats = tiled_backward(
        feats, binning.tile_offsets, basis, gimg_t, gt_t, tfin_t, last_t
    )

    # 2. scatter-add reduction [16, I] -> [C, 16]
    def scatter_add(dfeats, ranks):
        dsum = jnp.zeros((cap, 16), jnp.float32)
        return dsum.at[ranks].add(
            jnp.swapaxes(dfeats, 0, 1)[: ranks.shape[0]]
        )

    t_scat = timeit(
        "scatter-add [I,16] -> [C,16]",
        jax.jit(lambda d, r: scatter_add(d, r).sum()),
        dfeats, binning.isect_orig,
    )

    dsum = scatter_add(dfeats, binning.isect_orig)

    # 3. unsort scatters
    def unsort_all(dsum, order):
        out = jnp.zeros_like(dsum).at[order].set(dsum)
        return out

    t_uns = timeit(
        "unsort (single [C,16] scatter-set)",
        jax.jit(lambda d, o: unsort_all(d, o).sum()),
        dsum, binning.order,
    )

    def unsort_split(dsum, order):
        def unsort(x_s):
            return jnp.zeros_like(x_s).at[order].set(x_s)
        return (
            unsort(dsum[:, 0:2]), unsort(dsum[:, 2:5]),
            unsort(dsum[:, 5]), unsort(dsum[:, 6:9]),
            unsort(dsum[:, 9:11]),
        )

    t_uns5 = timeit(
        "unsort (5 split scatters, current)",
        jax.jit(
            lambda d, o: sum(x.sum() for x in unsort_split(d, o))
        ),
        dsum, binning.order,
    )

    # 4. projection + SH + pack VJP (everything before the kernel)
    def prep_loss(params):
        proj, colors, opac, radii = stage_proj(params)
        _, _, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, radii, proj.depths,
            h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles, isect_cap,
        )
        return feats.sum()

    t_prepvjp = timeit(
        "proj+SH+bin+pack fwd+VJP",
        jax.jit(jax.grad(prep_loss)),
        params,
    )
    t_prep = timeit(
        "proj+SH+bin+pack fwd only",
        jax.jit(prep_loss),
        params,
    )

    print()
    print(f"  bwd kernel:            {t_kern:7.2f}")
    print(f"  scatter-add:           {t_scat:7.2f}")
    print(f"  unsort(current 5x):    {t_uns5:7.2f}")
    print(f"  unsort(single):        {t_uns:7.2f}")
    print(f"  prep VJP overhead:     {t_prepvjp - t_prep:7.2f}")
    print(f"  implied bwd chain:     "
          f"{t_kern + t_scat + t_uns5 + t_prepvjp - t_prep:7.2f}")


if __name__ == "__main__":
    main()
