"""Dump compiled-HLO stats for the origin vs const dirs variants to find
the op/fusion difference behind the +8 ms step cost.

Usage: python scripts/hlo_dirs_diff.py
"""

import collections
import re
import sys

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


def main():
    n, h, w = 100_000, 800, 800
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    cfg.isect_mult = 3.796
    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    alive = model.alive
    bg = jnp.ones((3,), jnp.float32)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    cap = model.capacity
    cam_pos_np = jnp.asarray([0.0, 0.0, -4.0], jnp.float32)

    def make(mode):
        def loss_fn(params, absd):
            scales = jnp.exp(params.log_scales)
            opac = jax.nn.sigmoid(params.logit_opacities) * alive
            intr = CameraIntrinsics.from_K(K, w, h)
            proj = project_gaussians(
                params.means, params.quats, scales, w2c, intr
            )
            if mode == "origin":
                dirs = params.means
            else:
                dirs = params.means - cam_pos_np[None, :]
            dirs = dirs / jnp.maximum(
                jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8
            )
            colors = eval_sh_color(
                3, jnp.concatenate([params.sh_0, params.sh_rest], 1), dirs
            )
            opac_eff = opac * (proj.radii > 0.0)
            img, alpha = rasterize_tiled(
                proj.means2d, proj.conics, colors, opac_eff, proj.depths,
                bg, absd, h, w, radii=proj.radii, tile_size=cfg.tile_size,
                max_tiles_w=cfg.max_tiles, max_tiles_h=cfg.max_tiles,
                isect_mult=cfg.isect_mult,
            )
            ld = loss_dict(img, image, mask, cfg.lambda_ssim)
            return ld["total"], proj.radii

        def stage(params):
            absd = jnp.zeros((cap, 2), jnp.float32)
            (_, radii), (g, absg) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, absd)
            return (
                sum(jnp.sum(x) for x in jax.tree.leaves(g)) + absg.sum()
            )

        return jax.jit(stage)

    stats = {}
    texts = {}
    for mode in ("origin", "const"):
        compiled = make(mode).lower(model.params).compile()
        txt = compiled.as_text()
        texts[mode] = txt
        ops = collections.Counter(
            re.match(r"\s*(?:ROOT )?[%\w.\-]+ = \S+ (\w+)", line).group(1)
            for line in txt.splitlines()
            if re.match(r"\s*(?:ROOT )?[%\w.\-]+ = ", line)
        )
        stats[mode] = ops
        with open(f"/tmp/hlo_{mode}.txt", "w") as f:
            f.write(txt)
        print(f"--- {mode}: {sum(ops.values())} ops, "
              f"{len(txt.splitlines())} lines")

    keys = sorted(set(stats["origin"]) | set(stats["const"]))
    print(f"{'op':28s} {'origin':>8s} {'const':>8s}")
    for k in keys:
        a, b = stats["origin"].get(k, 0), stats["const"].get(k, 0)
        if a != b:
            print(f"{k:28s} {a:8d} {b:8d}")

    for mode in ("origin", "const"):
        m = re.findall(r"fusion[^\n]*kind=(\w+)", texts[mode])
        print(mode, "fusion kinds:", collections.Counter(m))


if __name__ == "__main__":
    main()
