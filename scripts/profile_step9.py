"""Round-3 step decomposition at the bench-1M operating point.

Times the REAL pipeline pieces cumulatively (each stage list compiled as
one jit, fetch-forced, min of 3) so stage costs are marginal diffs —
cross-check against top-level bench.py A/Bs before acting (PLAN caveat:
fori-harness attributions can mislead; this harness uses straight jits).

Usage: python scripts/profile_step9.py [N]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
H = W = 800


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        times.append(time.perf_counter() - t0)
    print(f"{name:58s} {min(times)*1e3:9.2f} ms", flush=True)
    return out


def main():
    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.ops.projection import (
        CameraIntrinsics,
        project_gaussians,
    )
    from easy_gaussian_splatting_tpu.ops import rasterize_tiled as rt

    rng = np.random.default_rng(0)
    model = init_gaussian_state(
        rng.uniform(-1.5, 1.5, (N, 3)).astype(np.float32),
        rng.integers(0, 256, (N, 3)).astype(np.uint8),
        sh_degree=3,
    )
    params, alive = model.params, model.alive
    K = jnp.array([[1111.0, 0, W / 2], [0, 1111.0, H / 2], [0, 0, 1.0]])
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    cap = model.capacity
    print(f"N={N} capacity={cap}", flush=True)

    # autotune like the bench
    counter = rt.make_isect_counter(32, 4, 4)
    vals = np.asarray(
        counter(params, alive, w2c, K, height=H, width=W)
    )
    n_isect = int(vals[0])
    small_budget, ov_frac, best = 9, 0.125, None
    for bb, need in zip(rt.BUDGET_CANDIDATES, vals[2:]):
        if bb >= 16:
            continue
        ovf = round(max(0.01, min(1.0, int(need) * 2.0 / cap)), 3)
        dom = cap * bb + 16 * rt._ov_capacity(cap, ovf)
        if best is None or dom < best:
            small_budget, ov_frac, best = bb, ovf, dom
    ov_cap = rt._ov_capacity(cap, ov_frac)
    domain = cap * small_budget + 16 * ov_cap
    icap = -(-int(cap * round(n_isect * 1.3 / cap, 3)) // 128) * 128
    print(
        f"isects={n_isect} b={small_budget} ov={ov_cap} "
        f"domain={domain} icap={icap}",
        flush=True,
    )

    geom = rt.image_geometry(H, W, 32)

    def proj(params, alive):
        scales = jnp.exp(params.log_scales)
        opac = jax.nn.sigmoid(params.logit_opacities) * alive.astype(
            jnp.float32
        )
        intr = CameraIntrinsics.from_K(K, W, H)
        pr = project_gaussians(params.means, params.quats, scales, w2c,
                               intr)
        radii = jnp.where(opac > 0.0, pr.radii, 0.0)
        return pr.means2d, pr.conics, radii, pr.depths, opac

    m2d, con, radii, dep, opa = timed("projection", proj, params, alive)
    ext = timed(
        "extents", rt.binning_extents, con, opa, radii
    )

    def binfull(m2d, ext, dep, con, opa):
        return rt.bin_gaussians(
            m2d, ext, dep, geom, 4, 4, conics=con, opacities=opa,
            ov_capacity=ov_cap, small_budget=small_budget,
        )

    binning = timed("bin_gaussians (keys+exact+SORT+offsets)",
                    binfull, m2d, ext, dep, con, opa)

    # isolate: the main sort alone at the real domain
    keyss = jax.jit(lambda d: jax.random.randint(
        jax.random.PRNGKey(0), (domain,), 0, 1 << 30, jnp.int32))(0)
    pay = jax.jit(lambda d: jax.random.randint(
        jax.random.PRNGKey(1), (domain,), 0, 1 << 24, jnp.int32))(0)
    timed(
        f"main sort alone ({domain/1e6:.1f}M x 2 i32)",
        lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=False),
        keyss, pay,
    )
    timed(
        f"flat sort alone ({icap/1e6:.2f}M x 2 i32)",
        lambda a: jax.lax.sort(
            (a[:icap], jnp.arange(icap, dtype=jnp.int32)),
            num_keys=1, is_stable=False,
        ),
        pay,
    )

    g9 = jnp.concatenate([m2d, con, jnp.zeros((cap, 3)), opa[:, None]], 1)
    sliced = rt.Binning(
        order=binning.order,
        isect_orig=binning.isect_orig[:icap],
        isect_flat=binning.isect_flat[:icap],
        isect_tile=binning.isect_tile[:icap],
        tile_offsets=jnp.minimum(binning.tile_offsets, icap),
        num_isects=binning.num_isects,
        counts=binning.counts,
        num_overflow=binning.num_overflow,
    )
    timed(
        "pack_features (g9 gather + poly)",
        lambda g9: rt.pack_features(g9, sliced, geom), g9,
    )


if __name__ == "__main__":
    main()
