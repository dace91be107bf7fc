"""Stage-by-stage ablation of the training step on the attached chip.

Builds nested jitted pipelines (each adding one stage) and reports the
deltas, so optimization effort goes where the time actually is.

Usage: python scripts/profile_step.py [N] [H] [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
from easy_gaussian_splatting_tpu.models.render import CameraView
from easy_gaussian_splatting_tpu.ops.projection import (
    CameraIntrinsics,
    project_gaussians,
)
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
    _prepare,
    image_geometry,
    tile_pixel_basis,
    rasterize_tiled,
)
from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import tiled_forward
from easy_gaussian_splatting_tpu.ops.sh import eval_sh_color
from easy_gaussian_splatting_tpu.training.config import config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    get_render_fn,
    make_train_step,
)


def timeit(name, f, *a, iters=20):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3)
    adam = init_adam_state(model.params)
    cap = model.capacity
    print(f"N={n} capacity={cap} image={w}x{h}")

    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    isect_cap = -(-int(cfg.isect_mult * cap) // 128) * 128

    params, alive = model.params, model.alive

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
        return proj, colors, opac * (proj.radii > 0)

    def stage_prepare(params):
        proj, colors, opac = stage_proj(params)
        geom, binning, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, proj.radii,
            proj.depths, h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles,
            isect_cap,
        )
        return binning.tile_offsets, feats

    def stage_kernel(params):
        offs, feats = stage_prepare(params)
        geom = image_geometry(h, w, cfg.tile_size)
        basis = tile_pixel_basis(geom)
        rgb, tfin, last = tiled_forward(feats, offs, basis, geom.num_tiles)
        return rgb.sum()

    def full_fwd(params):
        proj, colors, opac = stage_proj(params)
        img, alpha = rasterize_tiled(
            proj.means2d, proj.conics, colors, opac, proj.depths,
            jnp.ones(3), jnp.zeros((cap, 2)), h, w, radii=proj.radii,
            tile_size=cfg.tile_size, isect_mult=cfg.isect_mult,
            interpret=False,
        )
        return img.sum()

    def full_loss(params, absd):
        proj, colors, opac = stage_proj(params)
        img, alpha = rasterize_tiled(
            proj.means2d, proj.conics, colors, opac, proj.depths,
            jnp.ones(3), absd, h, w, radii=proj.radii,
            tile_size=cfg.tile_size, isect_mult=cfg.isect_mult,
            interpret=False,
        )
        return jnp.sum(img**2)

    t_proj = timeit(
        "projection+SH (fwd)",
        jax.jit(lambda p: jax.tree.map(jnp.sum, stage_proj(p)[0]).depths),
        params,
    )
    t_prep = timeit(
        "+ binning+pack (fwd)",
        jax.jit(lambda p: stage_prepare(p)[1].sum()),
        params,
    )
    t_kern = timeit("+ forward kernel", jax.jit(stage_kernel), params)
    t_fwd = timeit("full forward (assembled)", jax.jit(full_fwd), params)
    t_bwd = timeit(
        "full forward+backward",
        jax.jit(jax.grad(full_loss, argnums=(0, 1))),
        params,
        jnp.zeros((cap, 2)),
    )

    step_fn = make_train_step(cfg, get_render_fn(cfg))

    def one(model, adam):
        return step_fn(
            model, adam, w2c, K, image, mask,
            np.float32(1e-3), np.bool_(True), np.bool_(False),
            np.bool_(False), height=h, width=w, sh_degree=3,
        )

    m, a, ld = one(model, adam)
    jax.block_until_ready(ld)
    t0 = time.perf_counter()
    for _ in range(20):
        m, a, ld = one(m, a)
    jax.block_until_ready(ld)
    t_step = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{'full train step':40s} {t_step:8.2f} ms")
    print()
    print(f"  projection+SH:     {t_proj:6.2f}")
    print(f"  binning+pack:      {t_prep - t_proj:6.2f}")
    print(f"  forward kernel:    {t_kern - t_prep:6.2f}")
    print(f"  image assembly:    {t_fwd - t_kern:6.2f}")
    print(f"  backward total:    {t_bwd - t_fwd:6.2f}")
    print(f"  loss+adam+stats:   {t_step - t_bwd:6.2f}")


if __name__ == "__main__":
    main()
