"""Bisect WHY camera-relative SH dirs cost +11 ms fwd+bwd vs origin dirs.

Variants: matmul cam_pos (current), scalar-expanded cam_pos, stop_gradient
cam_pos, constant cam_pos (numpy), camera dirs without normalization.

Usage: python scripts/profile_step5.py [N] [H] [W]
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
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import rasterize_tiled
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
    print(f"N={n} capacity={model.capacity} isect_mult={cfg.isect_mult}")

    alive = model.alive
    bg = jnp.ones((3,), jnp.float32)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    capacity = model.capacity
    cam_pos_np = jnp.asarray(
        -(np.eye(3).T @ np.array([0.0, 0.0, 4.0])), jnp.float32
    )

    def tsum(tree):
        return sum(jnp.sum(x) for x in jax.tree.leaves(tree))

    def render_inline(params, absd, mode):
        scales = jnp.exp(params.log_scales)
        opacities = jax.nn.sigmoid(params.logit_opacities) * alive.astype(
            jnp.float32
        )
        intr = CameraIntrinsics.from_K(K, w, h)
        proj = project_gaussians(
            params.means, params.quats, scales, w2c, intr
        )
        r_cw = w2c[:3, :3]
        t_cw = w2c[:3, 3]
        if mode == "matmul":
            cam_pos = -r_cw.T @ t_cw
            dirs = params.means - cam_pos[None, :]
        elif mode == "scalar":
            cam = [
                -(r_cw[0, j] * t_cw[0] + r_cw[1, j] * t_cw[1]
                  + r_cw[2, j] * t_cw[2])
                for j in range(3)
            ]
            dirs = jnp.stack(
                [params.means[:, j] - cam[j] for j in range(3)], axis=1
            )
        elif mode == "stopgrad":
            cam_pos = jax.lax.stop_gradient(-r_cw.T @ t_cw)
            dirs = params.means - cam_pos[None, :]
        elif mode == "const":
            dirs = params.means - cam_pos_np[None, :]
        elif mode == "origin":
            dirs = params.means
        elif mode == "sgall":
            # diagnostic: no gradient through the SH view direction
            dirs = jax.lax.stop_gradient(params.means - cam_pos_np[None, :])
        elif mode == "colnorm":
            # no [C,3] dirs materialization: per-column subtract+normalize
            x = params.means[:, 0] - cam_pos_np[0]
            y = params.means[:, 1] - cam_pos_np[1]
            z = params.means[:, 2] - cam_pos_np[2]
            inv = 1.0 / jnp.maximum(
                jnp.sqrt(x * x + y * y + z * z), 1e-8
            )
            dirs = jnp.stack([x * inv, y * inv, z * inv], axis=1)
        if mode not in ("colnorm",):
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8
            )
        shs = jnp.concatenate([params.sh_0, params.sh_rest], axis=1)
        colors = eval_sh_color(3, shs, dirs)
        opac_eff = opacities * (proj.radii > 0.0).astype(jnp.float32)
        img, alpha = rasterize_tiled(
            proj.means2d, proj.conics, colors, opac_eff, proj.depths, bg,
            absd, h, w, radii=proj.radii, tile_size=cfg.tile_size,
            max_tiles_w=cfg.max_tiles, max_tiles_h=cfg.max_tiles,
            isect_mult=cfg.isect_mult,
        )
        return img, proj.radii

    def make_stage(mode):
        def loss_fn(params, absd):
            img, radii = render_inline(params, absd, mode)
            ld = loss_dict(img, image, mask, cfg.lambda_ssim)
            return ld["total"], (ld, radii)

        def stage(params):
            absd = jnp.zeros((capacity, 2), jnp.float32)
            (_, (ld, radii)), (g, absg) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, absd)
            return tsum(g) + absg.sum()

        return stage

    for mode in ("origin", "const", "sgall", "colnorm"):
        timeit(f"dirs mode: {mode}", make_stage(mode), model.params)


if __name__ == "__main__":
    main()
