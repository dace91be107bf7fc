"""Tiled (Pallas) rasterizer vs the oracle: binning invariants, forward
equality, gradient and absgrad equality. Runs in Pallas interpret mode on
CPU; the same kernels compile for TPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.ops.rasterize_ref import rasterize
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
    bin_gaussians,
    image_geometry,
    image_to_tiles,
    tiles_to_image,
    rasterize_tiled,
)

H, W = 40, 72  # non-multiples of the tile size exercise padding


def _scene(rng, n=60, max_opac=0.95, big=False):
    means2d = jnp.asarray(
        rng.uniform([-6, -6], [W + 6, H + 6], size=(n, 2)).astype(np.float32)
    )
    L = rng.normal(size=(n, 2, 2)).astype(np.float32) * (2.0 if big else 0.6)
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
    # cull a few
    opac[:3] = 0.0
    radii[:3] = 0.0
    return (
        means2d,
        jnp.asarray(conics),
        jnp.asarray(colors),
        jnp.asarray(opac),
        jnp.asarray(radii),
        jnp.asarray(depths),
    )


class TestBinning:
    def test_offsets_and_depth_order(self, rng):
        m2d, con, col, opa, rad, dep = _scene(rng)
        geom = image_geometry(H, W, 16)
        b = bin_gaussians(m2d, rad, dep, geom, 8, 8)
        offs = np.asarray(b.tile_offsets)
        assert offs[0] == 0
        assert np.all(np.diff(offs) >= 0)
        origs = np.asarray(b.isect_orig)
        tiles = np.asarray(b.isect_tile)
        dep_np = np.asarray(dep)
        n_isect = int(b.num_isects)
        assert n_isect == offs[-1]
        # within each tile: correct tile ids, depth-ascending, no dups
        for t in range(geom.num_tiles):
            o = origs[offs[t] : offs[t + 1]]
            assert len(set(o.tolist())) == len(o)
            assert np.all(np.diff(dep_np[o]) >= 0)
            assert np.all(tiles[offs[t] : offs[t + 1]] == t)

    def test_coverage_matches_rects(self, rng):
        m2d, con, col, opa, rad, dep = _scene(rng, n=20)
        geom = image_geometry(H, W, 16)
        b = bin_gaussians(m2d, rad, dep, geom, 8, 8)
        offs = np.asarray(b.tile_offsets)
        origs = np.asarray(b.isect_orig)
        m2d_s = np.asarray(m2d)
        rad_s = np.asarray(rad)
        # brute-force expected coverage (in original index space)
        for t in range(geom.num_tiles):
            tx, ty = t % geom.tiles_x, t // geom.tiles_x
            got = set(origs[offs[t] : offs[t + 1]].tolist())
            expected = set()
            for i in range(20):
                if rad_s[i] <= 0:
                    continue
                x0 = int(np.clip((m2d_s[i, 0] - rad_s[i]) // 16, 0, geom.tiles_x - 1))
                x1 = int(np.clip((m2d_s[i, 0] + rad_s[i]) // 16, 0, geom.tiles_x - 1))
                y0 = int(np.clip((m2d_s[i, 1] - rad_s[i]) // 16, 0, geom.tiles_y - 1))
                y1 = int(np.clip((m2d_s[i, 1] + rad_s[i]) // 16, 0, geom.tiles_y - 1))
                if x0 <= tx <= x1 and y0 <= ty <= y1:
                    expected.add(i)
            assert got == expected, f"tile {t}"

    def test_two_population_matches_dense(self, rng):
        """With enough overflow slots, the two-population sort domain must
        reproduce the dense C*M domain exactly (same per-tile intersection
        lists in the same depth order)."""
        m2d, con, col, opa, rad, dep = _scene(rng, n=40, big=True)
        geom = image_geometry(H, W, 16)
        dense = bin_gaussians(m2d, rad, dep, geom, 8, 8, ov_capacity=0)
        twopop = bin_gaussians(m2d, rad, dep, geom, 8, 8, ov_capacity=40)
        n = int(dense.num_isects)
        assert int(twopop.num_isects) == n
        np.testing.assert_array_equal(
            np.asarray(dense.tile_offsets), np.asarray(twopop.tile_offsets)
        )
        np.testing.assert_array_equal(
            np.asarray(dense.isect_flat)[:n],
            np.asarray(twopop.isect_flat)[:n],
        )
        np.testing.assert_array_equal(
            np.asarray(dense.counts), np.asarray(twopop.counts)
        )

    def test_adaptive_budget_matches_dense(self, rng):
        """Any small-population budget reproduces the dense domain exactly
        when the overflow capacity covers every bigger-window gaussian,
        and the n_gt histogram counts the budget-exceeding windows."""
        m2d, con, col, opa, rad, dep = _scene(rng, n=40, big=True)
        geom = image_geometry(H, W, 16)
        dense = bin_gaussians(m2d, rad, dep, geom, 8, 8, ov_capacity=0)
        n = int(dense.num_isects)
        counts = np.asarray(dense.counts)
        for b, n_gt in zip((2, 4, 9), np.asarray(dense.n_gt)):
            # n_gt counts pre-exact-test windows (w*h > b): a superset of
            # the gaussians whose LIVE cell count exceeds b
            assert int(n_gt) >= int(np.sum(counts > b))
            adaptive = bin_gaussians(
                m2d, rad, dep, geom, 8, 8, ov_capacity=40, small_budget=b
            )
            assert int(adaptive.num_isects) == n, f"budget {b}"
            np.testing.assert_array_equal(
                np.asarray(dense.tile_offsets),
                np.asarray(adaptive.tile_offsets),
            )
            np.testing.assert_array_equal(
                np.asarray(dense.isect_flat)[:n],
                np.asarray(adaptive.isect_flat)[:n],
            )
            np.testing.assert_array_equal(
                counts, np.asarray(adaptive.counts)
            )

    def test_two_population_truncation_is_bounded(self, rng):
        """Big-window gaussians beyond the overflow capacity keep exactly
        their first SMALL_BUDGET cells; num_overflow reports the true
        big-window population so the watchdog can grow the capacity."""
        from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
            SMALL_BUDGET,
        )

        m2d, con, col, opa, rad, dep = _scene(rng, n=40, big=True)
        geom = image_geometry(H, W, 16)
        dense = bin_gaussians(m2d, rad, dep, geom, 8, 8, ov_capacity=0)
        dense_counts = np.asarray(dense.counts)
        n_big = int(np.sum(dense_counts > 0) and dense.num_overflow)
        assert n_big == int(dense.num_overflow)
        cap = max(1, n_big // 2)
        trunc = bin_gaussians(m2d, rad, dep, geom, 8, 8, ov_capacity=cap)
        t_counts = np.asarray(trunc.counts)
        assert int(trunc.num_overflow) == n_big
        # truncated gaussians keep <= SMALL_BUDGET cells; everyone else
        # keeps their dense count
        reduced = t_counts < dense_counts
        assert np.all(t_counts[reduced] <= SMALL_BUDGET)
        assert np.all(t_counts[~reduced] == dense_counts[~reduced])
        # every surviving intersection exists in the dense set
        n_t = int(trunc.num_isects)
        dense_set = set(np.asarray(dense.isect_flat)[: int(dense.num_isects)].tolist())
        assert set(np.asarray(trunc.isect_flat)[:n_t].tolist()) <= dense_set

    def test_tile_roundtrip(self, rng):
        img = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
        geom = image_geometry(H, W, 16)
        tiles = image_to_tiles(img, geom, H, W)
        back = tiles_to_image(tiles, geom, H, W)
        np.testing.assert_allclose(np.asarray(back), np.asarray(img))


def _run_both(scene, tile_size=16, **kw):
    m2d, con, col, opa, rad, dep = scene
    n = m2d.shape[0]
    bg = jnp.array([0.1, 0.2, 0.3])
    dummy = jnp.zeros((n, 2))
    img_o, alpha_o = rasterize(
        m2d, con, col, opa, dep, bg, dummy, H, W, radii=rad
    )
    kw.setdefault("isect_mult", 8)  # small-N test scenes have large
    # per-gaussian tile coverage; production uses the trainer's watchdog
    img_t, alpha_t = rasterize_tiled(
        m2d, con, col, opa, dep, bg, dummy, H, W, radii=rad,
        tile_size=tile_size, interpret=True, **kw,
    )
    return img_o, alpha_o, img_t, alpha_t


class TestTiledForward:
    def test_exact_match_low_opacity(self, rng):
        # with opacity <= 0.3, contributions outside the 3-sigma bounding box
        # fall below the 1/255 threshold, so binning == global eligibility
        # and the tiled result equals the oracle exactly (up to fp order)
        scene = _scene(rng, max_opac=0.3)
        img_o, alpha_o, img_t, alpha_t = _run_both(scene)
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_o), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(alpha_t), np.asarray(alpha_o), atol=2e-5
        )

    def test_close_match_any_opacity(self, rng):
        # opaque gaussians may contribute up to ~e^-4.5 outside their
        # bounding box, which the tiled path (like the CUDA reference) cuts
        scene = _scene(rng, max_opac=0.95)
        img_o, alpha_o, img_t, alpha_t = _run_both(scene)
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_o), atol=2e-2
        )

    def test_empty_scene_is_background(self, rng):
        m2d, con, col, opa, rad, dep = _scene(rng, n=5)
        bg = jnp.array([0.6, 0.5, 0.4])
        img, alpha = rasterize_tiled(
            m2d, con, col, jnp.zeros_like(opa), dep, bg,
            jnp.zeros((5, 2)), H, W, radii=jnp.zeros_like(rad),
            tile_size=16, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(img), np.broadcast_to(np.asarray(bg), (H, W, 3)),
            atol=1e-6,
        )
        np.testing.assert_allclose(np.asarray(alpha), 0.0, atol=1e-6)

    def test_opaque_stack_early_stop(self, rng):
        n = 40
        m2d = jnp.tile(jnp.array([[36.0, 20.0]], jnp.float32), (n, 1))
        con = jnp.tile(jnp.array([[0.5, 0.0, 0.5]], jnp.float32), (n, 1))
        col = jnp.ones((n, 3), jnp.float32)
        opa = jnp.full((n,), 0.99, jnp.float32)
        rad = jnp.full((n,), 5.0, jnp.float32)
        dep = jnp.arange(n, dtype=jnp.float32) + 1.0
        bg = jnp.zeros(3)
        img_o, alpha_o = rasterize(
            m2d, con, col, opa, dep, bg, jnp.zeros((n, 2)), H, W, radii=rad
        )
        img_t, alpha_t = rasterize_tiled(
            m2d, con, col, opa, dep, bg, jnp.zeros((n, 2)), H, W, radii=rad,
            tile_size=16, interpret=True, isect_mult=8,
        )
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_o), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(alpha_t), np.asarray(alpha_o), atol=1e-5
        )


class TestTiledBackward:
    def test_grads_match_oracle_low_opacity(self, rng):
        scene = _scene(rng, max_opac=0.3)
        m2d, con, col, opa, rad, dep = scene
        n = m2d.shape[0]
        bg = jnp.array([0.3, 0.2, 0.1])
        g_img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def loss_oracle(m, c, k, o, d):
            img, alpha = rasterize(m, c, k, o, dep, bg, d, H, W, radii=rad)
            return jnp.sum(img * g_img) + jnp.sum(alpha**2)

        def loss_tiled(m, c, k, o, d):
            img, alpha = rasterize_tiled(
                m, c, k, o, dep, bg, d, H, W, radii=rad,
                tile_size=16, interpret=True, isect_mult=8,
            )
            return jnp.sum(img * g_img) + jnp.sum(alpha**2)

        dummy = jnp.zeros((n, 2))
        go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(
            m2d, con, col, opa, dummy
        )
        gt = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4))(
            m2d, con, col, opa, dummy
        )
        names = ["means2d", "conic", "color", "opac", "absgrad"]
        for a, b, nm in zip(go, gt, names):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=5e-4, rtol=2e-3,
                err_msg=f"grad mismatch: {nm}",
            )

    def test_band_reduce_grads_match_scan(self, rng, monkeypatch):
        """The Pallas band-segsum backward reduction (BWD_REDUCE=band)
        must produce the same gradients as the XLA log-step scan."""
        from easy_gaussian_splatting_tpu.ops import rasterize_tiled as rt

        scene = _scene(rng, max_opac=0.9)
        m2d, con, col, opa, rad, dep = scene
        n = m2d.shape[0]
        bg = jnp.array([0.1, 0.5, 0.9])
        g_img = jnp.asarray(rng.normal(size=(H, W, 3)).astype(np.float32))

        def loss(m, c, k, o, d):
            img, alpha = rasterize_tiled(
                m, c, k, o, dep, bg, d, H, W, radii=rad,
                tile_size=16, interpret=True, isect_mult=8,
            )
            return jnp.sum(img * g_img) + jnp.sum(alpha**2)

        dummy = jnp.zeros((n, 2))
        monkeypatch.setattr(rt, "BWD_REDUCE", "scan")
        gs = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            m2d, con, col, opa, dummy
        )
        monkeypatch.setattr(rt, "BWD_REDUCE", "band")
        gb = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
            m2d, con, col, opa, dummy
        )
        names = ["means2d", "conic", "color", "opac", "absgrad"]
        for a, b, nm in zip(gs, gb, names):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4,
                err_msg=f"band vs scan grad mismatch: {nm}",
            )

    def test_absgrad_positive_and_bounding(self, rng):
        scene = _scene(rng, max_opac=0.3)
        m2d, con, col, opa, rad, dep = scene
        n = m2d.shape[0]
        bg = jnp.zeros(3)

        def loss(m, d):
            img, _ = rasterize_tiled(
                m, con, col, opa, dep, bg, d, H, W, radii=rad,
                tile_size=16, interpret=True, isect_mult=8,
            )
            return jnp.sum(img**2)

        g_m2d, absgrad = jax.grad(loss, argnums=(0, 1))(
            m2d, jnp.zeros((n, 2))
        )
        absgrad = np.asarray(absgrad)
        assert np.all(absgrad >= 0)
        assert np.all(absgrad - np.abs(np.asarray(g_m2d)) >= -1e-5)


class TestDeadSlots:
    @pytest.mark.slow
    def test_zero_opacity_not_binned(self, rng):
        """Dead capacity slots project as unit-scale blobs with big radii
        and zero opacity; they must not consume intersection capacity
        (regression: they exhausted isect_cap and truncated real content)."""
        from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
            bin_gaussians,
        )

        n_live, n_dead = 50, 500
        live = _scene(rng, n=n_live, max_opac=0.3)
        m2d, con, col, opa, rad, dep = live
        # dead slots: center of image, radius covering everything, opac 0
        m2d_d = jnp.tile(jnp.array([[W / 2, H / 2]], jnp.float32), (n_dead, 1))
        con_d = jnp.tile(jnp.array([[0.01, 0.0, 0.01]], jnp.float32), (n_dead, 1))
        col_d = jnp.zeros((n_dead, 3))
        opa_d = jnp.zeros((n_dead,))
        rad_d = jnp.full((n_dead,), 200.0)
        dep_d = jnp.full((n_dead,), 0.5)  # in FRONT of everything

        m2d_all = jnp.concatenate([m2d, m2d_d])
        con_all = jnp.concatenate([con, con_d])
        col_all = jnp.concatenate([col, col_d])
        opa_all = jnp.concatenate([opa, opa_d])
        rad_all = jnp.concatenate([rad, rad_d])
        dep_all = jnp.concatenate([dep, dep_d])
        n = n_live + n_dead
        bg = jnp.array([0.1, 0.2, 0.3])
        dummy = jnp.zeros((n, 2))

        # tiny isect capacity: only correct if dead slots are not binned
        img_t, alpha_t = rasterize_tiled(
            m2d_all, con_all, col_all, opa_all, dep_all, bg, dummy, H, W,
            radii=rad_all, tile_size=16, isect_mult=2, interpret=True,
        )
        img_o, alpha_o = rasterize(
            m2d_all, con_all, col_all, opa_all, dep_all, bg, dummy, H, W,
            radii=rad_all,
        )
        np.testing.assert_allclose(
            np.asarray(img_t), np.asarray(img_o), atol=2e-5
        )


class TestEllipseTileTest:
    """The exact ellipse/tile refinement (bin_gaussians with conics) must
    only drop duplicates whose tile contains no eligible pixel center —
    output-exact vs the rectangle-only binning."""

    @pytest.mark.slow
    def test_prunes_only_ineligible_tiles(self, rng):
        from easy_gaussian_splatting_tpu.ops.rasterize_ref import ALPHA_THRESH
        from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
            binning_extents,
        )

        m2d, con, col, opa, rad, dep = _scene(rng, n=80, big=True)
        geom = image_geometry(H, W, 16)
        ext = binning_extents(con, opa, rad)
        b_rect = bin_gaussians(m2d, ext, dep, geom, 8, 8)
        b_ell = bin_gaussians(
            m2d, ext, dep, geom, 8, 8, conics=con, opacities=opa
        )
        # refinement is monotone: a subset of the rectangle binning
        assert int(b_ell.num_isects) <= int(b_rect.num_isects)

        def pairs(b):
            offs = np.asarray(b.tile_offsets)
            origs = np.asarray(b.isect_orig)
            out = set()
            for t in range(geom.num_tiles):
                for r in origs[offs[t]: offs[t + 1]].tolist():
                    out.add((t, r))
            return out

        kept = pairs(b_ell)
        dropped = pairs(b_rect) - kept
        assert dropped, "scene should exercise the pruning path"
        # intersections carry original indices directly
        m2d_s = np.asarray(m2d)
        con_s = np.asarray(con)
        opa_s = np.asarray(opa)
        ts = geom.tile_size
        for (t, r) in dropped:
            tx, ty = t % geom.tiles_x, t // geom.tiles_x
            px = tx * ts + np.arange(ts) + 0.5
            py = ty * ts + np.arange(ts) + 0.5
            dx = px[None, :] - m2d_s[r, 0]
            dy = py[:, None] - m2d_s[r, 1]
            a, bb, cc = con_s[r]
            sigma = 0.5 * a * dx**2 + 0.5 * cc * dy**2 + bb * dx * dy
            alpha = opa_s[r] * np.exp(-sigma)
            assert alpha.max() < ALPHA_THRESH, (
                f"pruned (tile {t}, rank {r}) had an eligible pixel "
                f"(max alpha {alpha.max():.4f})"
            )


class TestTruncationSafety:
    def test_truncated_cap_zeroes_gradient(self, rng):
        """When num_isects exceeds the intersection capacity, the backward's
        group starts would misalign, so the gradient must be EXACTLY zero
        (a skipped step) — never a misattributed one."""
        scene = _scene(rng, max_opac=0.3, big=True)
        m2d, con, col, opa, rad, dep = scene
        n = m2d.shape[0]
        bg = jnp.zeros(3)

        def loss(mult):
            def f(m, d):
                img, _ = rasterize_tiled(
                    m, con, col, opa, dep, bg, d, H, W, radii=rad,
                    tile_size=16, interpret=True, isect_mult=mult,
                )
                return jnp.sum(img**2)
            return f

        # verify the scene actually overflows a tiny cap
        from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
            binning_extents,
        )

        geom = image_geometry(H, W, 16)
        ext = binning_extents(con, opa, rad)
        b = bin_gaussians(m2d, ext, dep, geom, conics=con, opacities=opa)
        assert int(b.num_isects) > n  # isect_mult=1 truncates

        dummy = jnp.zeros((n, 2))
        g_small, abs_small = jax.grad(loss(1), argnums=(0, 1))(m2d, dummy)
        assert np.all(np.asarray(g_small) == 0.0)
        assert np.all(np.asarray(abs_small) == 0.0)
        # ample capacity: gradient is nonzero
        g_big, _ = jax.grad(loss(8), argnums=(0, 1))(m2d, dummy)
        assert np.any(np.asarray(g_big) != 0.0)


def test_unpackable_sort_fallback_matches_packed():
    """Above ~2M Gaussians the (tile, rank) key no longer fits 31 bits
    and binning sorts with num_keys=2 — same ordering as the packed
    path (live region compared; the dead sentinel tail order is
    unspecified)."""
    import easy_gaussian_splatting_tpu.ops.rasterize_tiled as rt

    rng = np.random.default_rng(7)
    c = 2000
    geom = rt.image_geometry(96, 128, 32)
    m2d = jnp.asarray(rng.uniform(-10, 130, (c, 2)).astype(np.float32))
    ext = jnp.asarray(rng.uniform(0.5, 40, (c, 2)).astype(np.float32))
    dep = jnp.asarray(rng.uniform(1, 9, (c,)).astype(np.float32))

    def run():
        return rt.bin_gaussians(
            m2d, ext, dep, geom, 4, 4, ov_capacity=256, small_budget=4
        )

    a = run()
    rt._FORCE_UNPACKABLE = True
    try:
        b = run()
    finally:
        rt._FORCE_UNPACKABLE = False
    n = int(a.num_isects)
    assert n == int(b.num_isects) and n > 0
    np.testing.assert_array_equal(
        np.asarray(a.isect_flat[:n]), np.asarray(b.isect_flat[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(a.isect_tile[:n]), np.asarray(b.isect_tile[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(a.tile_offsets), np.asarray(b.tile_offsets)
    )
    np.testing.assert_array_equal(
        np.asarray(a.counts), np.asarray(b.counts)
    )


@pytest.mark.slow
@pytest.mark.parametrize("force_unpackable", [False, True])
def test_binkeys_kernel_matches_xla_grid(force_unpackable):
    """The Pallas binkeys path must reproduce the XLA duplicate-grid
    binning exactly: same intersections, offsets, and counts."""
    import easy_gaussian_splatting_tpu.ops.rasterize_tiled as rt

    rng = np.random.default_rng(11)
    c = 3000
    geom = rt.image_geometry(96, 128, 32)
    m2d = jnp.asarray(rng.uniform(-10, 130, (c, 2)).astype(np.float32))
    # anisotropic conics so the exact test prunes corner tiles
    L = rng.normal(size=(c, 2, 2)).astype(np.float32) * 2.0
    cov = L @ np.swapaxes(L, 1, 2) + np.eye(2)[None] * 1.0
    det = cov[:, 0, 0] * cov[:, 1, 1] - cov[:, 0, 1] ** 2
    con = jnp.asarray(
        np.stack(
            [cov[:, 1, 1] / det, -cov[:, 0, 1] / det, cov[:, 0, 0] / det],
            -1,
        ).astype(np.float32)
    )
    opa = jnp.asarray(rng.uniform(0.02, 0.95, (c,)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0.0, 60, (c,)).astype(np.float32))
    ext = rt.binning_extents(con, opa, radii)
    dep = jnp.asarray(rng.uniform(1, 9, (c,)).astype(np.float32))

    def run():
        return rt.bin_gaussians(
            m2d, ext, dep, geom, 4, 4, conics=con, opacities=opa,
            ov_capacity=512, small_budget=4,
        )

    rt._FORCE_UNPACKABLE = force_unpackable
    try:
        old_impl = rt.BINNING_IMPL
        rt.BINNING_IMPL = "xla"
        a = run()
        rt.BINNING_IMPL = "pallas"
        b = run()
    finally:
        rt.BINNING_IMPL = old_impl
        rt._FORCE_UNPACKABLE = False
    n = int(a.num_isects)
    assert n == int(b.num_isects) and n > 0
    np.testing.assert_array_equal(
        np.asarray(a.isect_flat[:n]), np.asarray(b.isect_flat[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(a.isect_tile[:n]), np.asarray(b.isect_tile[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(a.tile_offsets), np.asarray(b.tile_offsets)
    )
    np.testing.assert_array_equal(
        np.asarray(a.counts), np.asarray(b.counts)
    )
