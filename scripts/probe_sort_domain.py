"""Quantify binning sort-domain occupancy at a bench scale point.

Reports, for the bench.py synthetic camera at a given N: the exact
per-gaussian live-cell histogram (post exact-test counts), visibility,
the two-population domain the current autotune would pick, its sentinel
fraction, and the domain a multi-tier compaction (strides 1/2/4/8/16,
one [C] tier-sort + dynamic slices) would achieve. Drives docs/PLAN.md
"Optimization queue" item 0.

Usage: python scripts/probe_sort_domain.py [N] [H W]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800

    import jax
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.gaussians import (
        _round_up_capacity,
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.ops.projection import (
        CameraIntrinsics,
        project_gaussians,
    )
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        BUDGET_CANDIDATES,
        _ov_capacity,
        bin_gaussians,
        binning_extents,
        image_geometry,
    )

    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    capacity = None if n < 2_000_000 else _round_up_capacity(int(n * 1.05))
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3, capacity=capacity)
    c = model.capacity

    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)

    @jax.jit
    def counts_fn(params, alive):
        scales = jnp.exp(params.log_scales)
        opac = jax.nn.sigmoid(params.logit_opacities) * alive.astype(
            jnp.float32
        )
        intr = CameraIntrinsics.from_K(K, w, h)
        proj = project_gaussians(params.means, params.quats, scales, w2c, intr)
        radii = jnp.where(opac > 0.0, proj.radii, 0.0)
        geom = image_geometry(h, w, 32)
        extents = binning_extents(proj.conics, opac, radii)
        binning = bin_gaussians(
            proj.means2d, extents, proj.depths, geom, 4, 4,
            conics=proj.conics, opacities=opac,
            ov_capacity=_ov_capacity(c, 1.0), small_budget=16,
        )
        return binning.counts

    counts = np.asarray(counts_fn(model.params, model.alive))
    hist = np.bincount(np.minimum(counts, 17), minlength=18)
    n_isect = int(counts.sum())
    n_vis = int((counts > 0).sum())
    print(f"C={c} n_isect={n_isect} visible={n_vis} ({n_vis/c:.1%})")
    print("count histogram (cells: gaussians):")
    for k in range(17):
        if hist[k]:
            print(f"  {k:3d}: {hist[k]:9d}")

    m = 16
    print("\ncurrent two-population domains (ov margin 2.0):")
    for b in BUDGET_CANDIDATES:
        need = int((counts > b).sum())
        ovf = round(max(0.01, min(1.0, need * 2.0 / c)), 3)
        ov_cap = _ov_capacity(c, ovf)
        dom = c * b + m * ov_cap
        # live entries: small pop contributes min(count, b) for non-ov,
        # full count for ov members (first ov_cap of them)
        live = int(np.minimum(counts, b)[counts <= b].sum()) + int(
            counts[counts > b].sum()
        )
        print(
            f"  b={b}: D={dom} ({dom/n_isect:.2f}x isects) "
            f"ov_need={need} ov_cap={ov_cap} live={live} "
            f"sentinels={1 - live/dom:.1%}"
        )

    print("\nmulti-tier compaction (strides 1/2/4/8/16, margin 1.3):")
    tiers = [1, 2, 4, 8, 16]
    lo = 0
    dom = 0
    detail = []
    for s in tiers:
        nt = int(((counts > lo) & (counts <= s)).sum())
        cap_t = -(-int(nt * 1.3) // 256) * 256 if nt else 0
        dom += cap_t * s
        detail.append(f"  stride {s:2d}: n={nt:9d} cap={cap_t:9d}")
        lo = s
    print("\n".join(detail))
    print(f"  total D={dom} ({dom/max(n_isect,1):.2f}x isects)")


if __name__ == "__main__":
    main()
