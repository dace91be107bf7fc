"""Validate + benchmark the tiled Pallas rasterizer on the real TPU.

Usage: python scripts/tpu_kernel_check.py [N] [H] [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.ops.rasterize_ref import rasterize
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import rasterize_tiled


def make_scene(rng, n, h, w, max_opac=0.95):
    means2d = rng.uniform([-6, -6], [w + 6, h + 6], size=(n, 2)).astype(
        np.float32
    )
    L = rng.normal(size=(n, 2, 2)).astype(np.float32) * 0.8
    cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None] * 1.5
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    conics = np.stack(
        [cov[:, 1, 1] / det, -cov[:, 0, 1] / det, cov[:, 0, 0] / det], -1
    ).astype(np.float32)
    b = 0.5 * (cov[:, 0, 0] + cov[:, 1, 1])
    v1 = b + np.sqrt(np.maximum(b * b - det, 0.01))
    radii = np.ceil(3.0 * np.sqrt(v1)).astype(np.float32)
    colors = rng.uniform(size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.05, max_opac, size=(n,)).astype(np.float32)
    depths = rng.uniform(1.0, 10.0, size=(n,)).astype(np.float32)
    return tuple(
        jnp.asarray(x) for x in (means2d, conics, colors, opac, radii, depths)
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    rng = np.random.default_rng(0)

    # ---- correctness on a small scene vs the oracle
    sm = make_scene(rng, 400, 96, 128, max_opac=0.3)
    m2d, con, col, opa, rad, dep = sm
    bg = jnp.array([0.1, 0.2, 0.3])
    dummy = jnp.zeros((400, 2))

    img_o, alpha_o = jax.jit(
        lambda: rasterize(m2d, con, col, opa, dep, bg, dummy, 96, 128, radii=rad)
    )()
    img_t, alpha_t = jax.jit(
        lambda: rasterize_tiled(
            m2d, con, col, opa, dep, bg, dummy, 96, 128, radii=rad,
            interpret=False,
        )
    )()
    err = float(jnp.max(jnp.abs(img_o - img_t)))
    print(f"forward max err vs oracle (low-opac): {err:.2e}")
    assert err < 5e-3, "FORWARD MISMATCH"

    def loss_t(m, c, k, o, d):
        img, alpha = rasterize_tiled(
            m, c, k, o, dep, bg, d, 96, 128, radii=rad, interpret=False
        )
        return jnp.sum(img**2) + jnp.sum(alpha)

    def loss_o(m, c, k, o, d):
        img, alpha = rasterize(m, c, k, o, dep, bg, d, 96, 128, radii=rad)
        return jnp.sum(img**2) + jnp.sum(alpha)

    gt = jax.jit(jax.grad(loss_t, argnums=(0, 1, 2, 3, 4)))(
        m2d, con, col, opa, dummy
    )
    go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2, 3, 4)))(
        m2d, con, col, opa, dummy
    )
    for a, b, nm in zip(go, gt, ["m2d", "conic", "color", "opac", "absgrad"]):
        e = float(jnp.max(jnp.abs(a - b)))
        scale = float(jnp.max(jnp.abs(a))) + 1e-8
        print(f"grad {nm}: max abs err {e:.2e} (scale {scale:.2e})")
        assert e < 1e-2 * max(1.0, scale), f"GRAD MISMATCH {nm}"

    print("correctness OK; benchmarking...")

    # ---- speed on a realistic scene
    scene = make_scene(rng, n, h, w)
    m2d, con, col, opa, rad, dep = scene
    dummy = jnp.zeros((n, 2))

    fwd = jax.jit(
        lambda m, c, k, o: rasterize_tiled(
            m, c, k, o, dep, bg, dummy, h, w, radii=rad, interpret=False
        )[0]
    )
    img = fwd(m2d, con, col, opa)
    img.block_until_ready()
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        img = fwd(m2d, con, col, opa)
    img.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    print(f"forward: {dt*1e3:.2f} ms  ({h*w/dt/1e6:.1f} Mpix/s, N={n})")

    def loss(m, c, k, o, d):
        img, _ = rasterize_tiled(
            m, c, k, o, dep, bg, d, h, w, radii=rad, interpret=False
        )
        return jnp.sum(img**2)

    fwdbwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    g = fwdbwd(m2d, con, col, opa, dummy)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(iters):
        g = fwdbwd(m2d, con, col, opa, dummy)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / iters
    print(f"forward+backward: {dt*1e3:.2f} ms  ({1.0/dt:.2f} steps/s)")


if __name__ == "__main__":
    main()
