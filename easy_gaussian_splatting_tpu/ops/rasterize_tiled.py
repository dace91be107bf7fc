"""Tiled rasterization: binning + per-tile depth-ordered compositing.

This is the production TPU path for stages (3)-(6) of the pipeline the
reference delegates to gsplat's CUDA kernels (``/root/reference/model/
gaussian.py:353-374``): tile intersection, per-tile depth ordering, forward
alpha compositing, and the hand-derived backward (in
``pallas/tile_raster.py``).

TPU-first redesign of the CUDA tile pipeline:
- no global radix sort of (tile|depth) keys and no depth-sorted array
  copies: a cheap double-argsort yields each Gaussian's depth RANK, the
  duplicates are keyed by packed (tile, rank) — whose comparator equals
  tile-major/depth-minor ordering — and the sort payload is the ORIGINAL
  Gaussian index, so every downstream gather/scatter addresses the
  caller's arrays directly (each avoided [C,k] permutation gather costs
  ~1.1 ms at C=131k; TPU moves ~1 row per 10 ns regardless of width);
- per-tile index lists become one flat intersection array plus a [T+1]
  offsets table (CSR-style), consumed by a Pallas kernel whose grid walks
  tiles with scalar-prefetched offsets;
- per-intersection features are pre-gathered into a dense matrix so the
  kernel only does contiguous DMA (no gather on TPU);
- the Gaussian quadratic form is expressed in *tile-local* pixel
  coordinates as a 6-coefficient polynomial, so in-kernel evaluation is an
  [c, 8] x [8, tile_pixels] MXU matmul (local coords keep f32 exact).

Gaussians covering more than the duplication budget (w*h <=
max_tiles_w*max_tiles_h tiles, flexible aspect) are clamped to a centered
window (a bounded approximation the CUDA kernel does not need; only
affects footprints beyond the budget's tile area).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .projection import CameraIntrinsics, project_gaussians

# Backward per-Gaussian gradient reduction strategy (A/B via env):
#   "band" (DEFAULT): flat-sort + permutation gather + one-pass Pallas
#     band segsum (pallas/segments.py::segsum_band): per-block MXU
#     matmul with a 128-row lookahead replaces the XLA log-step scan's
#     ceil(log2 m) full-array add passes + materialized shifted slices.
#     Parallel pipelined grid — none of the serial-RMW pattern that
#     sank the "pallas" strategy. Measured on-chip (round 5, bench.py):
#     1M 162.4 -> 132.2 ms/step, 3M 471.2 -> 396.0, 100k neutral
#     (28.9 both — the wide-row gather offsets the scan saving at
#     small icap). Falls back to "scan" when max_tiles^2 > 128.
#   "scan": flat-sort + permutation gather + XLA segmented reduction
#     over the COMPACT intersection capacity (~1.3x the live
#     intersection count).
#   "pallas" (EXPERIMENTAL — loses in context): flat-sort + permutation
#     gather + streaming Pallas segment-sum-with-compaction +
#     monotone-expand kernels (ops/pallas/segments.py). Correct on chip
#     and faster than the XLA scan in ISOLATION (71+45 ms -> two
#     bandwidth-bound kernels at icap=2.56M), but the serial RMW window
#     pattern (has_side_effects start/wait DMA pairs) defeats XLA's
#     overlap: measured IN-CONTEXT 462 ms/step at 1M vs 158 ms scan
#     (100k: 55 vs 29) — see docs/PLAN.md "Round-4 A/B".
#   "dense": carry each sort entry's DENSE duplicate-slot id through the
#     binning sort; the backward inverts that permutation with one cheap
#     sort and gathers gradient rows straight into the dense grid, where
#     the per-Gaussian sum is a streaming group-reduce. Measured A/B at
#     1M Gaussians / 800^2: LOSES to "scan" — the dense domain D (the
#     sort domain, 6.5M there) is ~2.5x the intersection capacity, and
#     every dense-path gather/reduce scales with D. Kept switchable for
#     regimes where D ~ icap (large small_budget occupancy).
BWD_REDUCE = os.environ.get("EGS_TPU_BWD_REDUCE", "band")

DEFAULT_TILE = 32
DEFAULT_MAX_TILES_W = 4
DEFAULT_MAX_TILES_H = 4

# Hard per-buffer addressing bound for the intersection capacity: the
# backward's [I_pad, 128] gradient-row buffer must stay below 2^31 BYTES
# (int32 byte offsets in the DMA address path — the f32 layout crossed it
# at 4.19M rows and took the TPU worker down with a kernel fault; the
# bf16 hi/lo layout at 256 B/row moves the cliff to 8.39M rows, measured
# round 4: 7M-row backward runs, f32 7M faulted). Autotune/watchdog clamp
# against this in addition to the configured HBM budget; beyond it, shard
# over a gauss mesh (parallel/gauss_shard.py).
GRAD_ROW_BYTES = 256  # [128] lanes x bf16 (pallas/tile_raster.GRAD_DTYPE)
ISECT_ROW_LIMIT = (2**31) // GRAD_ROW_BYTES - 512  # headroom for i_pad


def max_isect_cap(hbm_budget_mb: float) -> int:
    """Largest safe intersection capacity: the configured HBM budget
    (~320 B/slot: [16, icap] f32 features + [icap, 128] bf16 gradient
    rows) AND the int32 DMA addressing bound."""
    return min(int(hbm_budget_mb * 1e6 / 320), ISECT_ROW_LIMIT)

# The per-intersection feature matrix is FEATURE-MAJOR [16, I] (rows on
# sublanes, intersections on lanes) — see pallas/tile_raster.py for the row
# layout; TPU DMA windows must be 128-lane slices, which this layout gives.


class TiledGeometry(NamedTuple):
    tiles_x: int
    tiles_y: int
    tile_size: int

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y


def image_geometry(height: int, width: int, tile_size: int) -> TiledGeometry:
    return TiledGeometry(
        tiles_x=-(-width // tile_size),
        tiles_y=-(-height // tile_size),
        tile_size=tile_size,
    )


class Binning(NamedTuple):
    """CSR-style per-tile intersection lists, depth-ordered within tile.

    Intersections are indexed in ORIGINAL Gaussian index space: gathers
    and gradient scatters address the caller's arrays directly, with no
    intermediate depth-sorted copies (each avoided [C,k] permutation
    gather costs ~10 ns/row on TPU regardless of row width).

    The sort payload is the FLAT duplicate-grid id ``orig * M + j``
    (sentinel ``C*M`` for dead lanes) so the backward can reduce
    per-intersection gradients to per-Gaussian rows without a
    duplicate-index scatter-add (15 ns/row on TPU): sorting by flat id
    groups each Gaussian's ≤M rows contiguously, a segmented log-step
    scan sums them, and ``counts`` locates each group's start."""

    order: jnp.ndarray  # [C] depth argsort (invalid gaussians at the end)
    isect_orig: jnp.ndarray  # [C*M] original gaussian index, tile-grouped
    isect_flat: jnp.ndarray  # [C*M] flat duplicate id orig*M+j (C*M = dead)
    isect_tile: jnp.ndarray  # [C*M] tile id per intersection (T = invalid)
    tile_offsets: jnp.ndarray  # [T+1]
    num_isects: jnp.ndarray  # [] int32
    counts: jnp.ndarray  # [C] live duplicates per gaussian
    num_overflow: jnp.ndarray  # [] int32: gaussians needing > small_budget
    # cells (should stay < the overflow capacity; watchdog grows ov_frac)
    n_gt: jnp.ndarray = None  # [len(BUDGET_CANDIDATES)] int32: gaussians
    # whose window exceeds each candidate budget (drives budget autotune)
    # --- dense-reduction side-channel (see _core_bwd): the sort domain is
    # a PERMUTATION of dense duplicate slots (population A: c*b_small + j;
    # population B: C*b_small + s*M + j), so carrying the dense slot id
    # through the binning sort gives the backward a sort-free path from
    # tile order to a reshape-summable dense layout.
    dense: jnp.ndarray = None  # [D] dense slot id per tile-order position
    # (FULL sort domain, untruncated — the inverse permutation needs all)
    in_ov: jnp.ndarray = None  # [C] bool: gaussian lives in population B
    ov_rank: jnp.ndarray = None  # [C] B slot of each gaussian (valid
    # where in_ov; the B->gaussian fold is a GATHER by this rank — a
    # scatter by slot measured ~4x slower at 250k rows)


def binning_extents(
    conics: jnp.ndarray,  # [C, 3]
    opacities: jnp.ndarray,  # [C]
    radii: jnp.ndarray,  # [C] circle radius (0 = culled)
) -> jnp.ndarray:
    """Tight per-axis half-widths [C, 2] of each Gaussian's *contributing*
    screen support, for tile binning.

    A pixel at offset d only contributes when alpha = opac * exp(-sigma)
    >= ALPHA_THRESH (the kernels' eligibility test), i.e. within the
    ellipse sigma <= ln(opac/thresh), whose axis-aligned bounding box has
    half-widths sqrt(2 * ln(opac/thresh) * cov_ii). Binning with this
    rectangle instead of the max-eigenvalue circle is output-exact (the
    excluded tiles contain no eligible pixel) and substantially reduces
    intersection counts for anisotropic and low-opacity Gaussians. The
    cutoff is capped at the 3-sigma convention the reported radii use, so
    the rectangle never exceeds the circle."""
    from .rasterize_ref import ALPHA_THRESH

    a, b, c = conics[:, 0], conics[:, 1], conics[:, 2]
    det_inv = jnp.maximum(a * c - b * b, 1e-12)  # = 1 / det(cov2d)
    cov00 = jnp.maximum(c / det_inv, 0.0)
    cov11 = jnp.maximum(a / det_inv, 0.0)
    s_max = jnp.log(jnp.maximum(opacities, 1e-12) / ALPHA_THRESH)
    s_max = jnp.clip(s_max, 0.0, 4.5)  # 4.5 = (3 sigma)^2 / 2
    rx = jnp.sqrt(2.0 * s_max * cov00)
    ry = jnp.sqrt(2.0 * s_max * cov11)
    live = (radii > 0.0) & (opacities > ALPHA_THRESH)
    rx = jnp.where(live, jnp.minimum(rx, radii), 0.0)
    ry = jnp.where(live, jnp.minimum(ry, radii), 0.0)
    return jnp.stack([rx, ry], axis=1)


# default cells covered by the small population (3x3 windows). The sort
# domain is C*small_budget + M*ov_capacity, and mid-training most
# gaussians cover 1-4 tiles, so the trainer AUTOTUNES the budget from the
# first frame's window-size histogram (see the counter's n_gt outputs) —
# a tighter budget at the same coverage halves the dominant sort cost.
SMALL_BUDGET = 9
BUDGET_CANDIDATES = (2, 4, 9)
# test hook: force the num_keys=2 sort fallback (the >2M-Gaussian path)
_FORCE_UNPACKABLE = False
# binning grid implementation: "pallas" (streaming binkeys kernel) or
# "xla" (the [C, M] jnp duplicate grid)
BINNING_IMPL = os.environ.get("EGS_TPU_BINNING", "pallas")


def _bin_gaussians_binkeys(
    *, c, m, ts, tx_n, num_tiles, b_small, ov_capacity, rank_bits,
    packable, order, rank, valid_s, mx, my, tx0, ty0, w, h, count, flag,
    num_overflow, n_gt, conics, opacities, interpret,
):
    """Two-population binning with the Pallas binkeys kernel building the
    duplicate-grid keys/flats/counts (j-major) instead of the XLA [C, M]
    grid. Ordering-equivalent to the XLA path (the sort consumes an
    unordered multiset of (key, flat) entries)."""
    from .pallas.binkeys import GBLK, binkeys
    from .rasterize_ref import ALPHA_THRESH

    s_max = jnp.clip(
        jnp.log(jnp.maximum(opacities, 1e-12) / ALPHA_THRESH), 0.0, 4.5
    )
    ov_rank = jnp.cumsum(flag.astype(jnp.int32)) - flag.astype(jnp.int32)
    in_ov = flag & (ov_rank < ov_capacity)
    arange_c = jnp.arange(c, dtype=jnp.int32)
    ov_id = jax.lax.sort(jnp.where(in_ov, arange_c, c))[:ov_capacity]
    slot_valid = ov_id < c
    safe_id = jnp.minimum(ov_id, c - 1)

    kr_bits = rank_bits if packable else 0
    cols = dict(
        mx=mx, my=my,
        tx0=tx0.astype(jnp.float32), ty0=ty0.astype(jnp.float32),
        w=w.astype(jnp.float32), h=h.astype(jnp.float32),
        a=conics[:, 0], b=conics[:, 1], cc=conics[:, 2],
        s_max=s_max, rank=rank.astype(jnp.float32),
        count_w=count.astype(jnp.float32),
        orig=arange_c.astype(jnp.float32),
    )

    def stack_feats(take, livebase, n_lanes):
        pad = -(-n_lanes // GBLK) * GBLK - n_lanes
        rows = [
            cols["mx"], cols["my"], cols["tx0"], cols["ty0"],
            cols["w"], cols["h"], cols["a"], cols["b"], cols["cc"],
            cols["s_max"], cols["rank"], livebase.astype(jnp.float32),
            cols["count_w"], cols["orig"],
        ]
        if take is not None:
            rows = [r[take] for r in rows[:11]] + [
                livebase.astype(jnp.float32),
                cols["count_w"][take], cols["orig"][take],
            ]
        rows += [jnp.zeros_like(rows[0])] * 2
        return jnp.stack(
            [jnp.pad(r, (0, pad)) for r in rows], axis=0
        )

    feats_a = stack_feats(None, valid_s & jnp.logical_not(in_ov), c)
    packed_a, flats_a, cnt_small, cnt_full = binkeys(
        feats_a, n_keys=b_small, m=m, ts=ts, tiles_x=tx_n,
        num_tiles=num_tiles, rank_bits=kr_bits, sentinel_flat=c * m,
        interpret=interpret,
    )
    feats_b = stack_feats(safe_id, slot_valid, ov_capacity)
    packed_b, flats_b, _, _ = binkeys(
        feats_b, n_keys=m, m=m, ts=ts, tiles_x=tx_n,
        num_tiles=num_tiles, rank_bits=kr_bits, sentinel_flat=c * m,
        interpret=interpret,
    )
    # counts: small-budget cells for population A members, full window
    # for overflow members — both from the SAME exact-test pass
    counts = jnp.where(in_ov, cnt_full[:c], cnt_small[:c])

    keys_dom = jnp.concatenate(
        [packed_a.reshape(-1), packed_b.reshape(-1)]
    )
    flats_dom = jnp.concatenate(
        [flats_a.reshape(-1), flats_b.reshape(-1)]
    )
    if packable:
        sorted_packed, sorted_flat = jax.lax.sort(
            (keys_dom, flats_dom), num_keys=1, is_stable=False
        )
        sorted_keys = (sorted_packed >> rank_bits).astype(jnp.int32)
    else:
        ca = feats_a.shape[1]
        rank_dom = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.pad(rank, (0, ca - c))[None, :], (b_small, ca)
                ).reshape(-1),
                jnp.broadcast_to(
                    jnp.pad(rank[safe_id], (0, feats_b.shape[1] - ov_capacity))[
                        None, :
                    ],
                    (m, feats_b.shape[1]),
                ).reshape(-1),
            ]
        )
        sorted_keys, _, sorted_flat = jax.lax.sort(
            (keys_dom, rank_dom, flats_dom), num_keys=2, is_stable=False
        )
    sorted_orig = jnp.minimum(sorted_flat // m, c - 1)
    tile_offsets = jnp.searchsorted(
        sorted_keys, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)
    return Binning(
        order=order,
        isect_orig=sorted_orig,
        isect_flat=sorted_flat,
        isect_tile=sorted_keys,
        tile_offsets=tile_offsets,
        num_isects=tile_offsets[num_tiles],
        counts=counts,
        num_overflow=num_overflow,
        n_gt=n_gt,
    )


def bin_gaussians(
    means2d: jnp.ndarray,  # [C, 2]
    extents: jnp.ndarray,  # [C, 2] per-axis half-widths, or [C] radii
    depths: jnp.ndarray,  # [C]
    geom: TiledGeometry,
    max_tiles_w: int = DEFAULT_MAX_TILES_W,
    max_tiles_h: int = DEFAULT_MAX_TILES_H,
    conics: jnp.ndarray | None = None,  # [C, 3] enables the exact tile test
    opacities: jnp.ndarray | None = None,  # [C] required with conics
    ov_capacity: int | None = None,  # overflow-population slots (None: C//8)
    small_budget: int = SMALL_BUDGET,  # small-population cells per gaussian
    interpret: bool | None = None,  # Pallas interpret mode (binkeys path)
    y_limit: jnp.ndarray | None = None,  # traced row count: bin only rows
    # [0, y_limit) of the window (adaptive stripe sharding; rows beyond
    # keep the static geometry but receive no intersections)
) -> Binning:
    if interpret is None:
        interpret = _interpret_default()
    c = means2d.shape[0]
    ts = geom.tile_size
    tx_n, ty_n = geom.tiles_x, geom.tiles_y
    num_tiles = geom.num_tiles
    m = max_tiles_w * max_tiles_h

    if extents.ndim == 1:
        extents = jnp.stack([extents, extents], axis=1)
    valid = (extents[:, 0] > 0.0) & (extents[:, 1] > 0.0)
    rx, ry = extents[:, 0], extents[:, 1]
    mx, my = means2d[:, 0], means2d[:, 1]
    lim_row = None
    if y_limit is not None:
        # dynamic vertical bound: exclude gaussians whose contributing
        # rect starts at/below the limit, and clamp tile windows to it
        # (the exact ellipse/tile test already handles the static bottom
        # edge; this adds the traced one)
        valid = valid & ((my - ry) < y_limit)
        lim_row = jnp.maximum(
            jnp.ceil(y_limit / ts).astype(jnp.int32), 1
        )
    # everything below stays in ORIGINAL index space: the depth sort is
    # carried as a per-Gaussian rank in the sort key, never as permuted
    # copies of the per-Gaussian arrays (argsorts are ~0.15 ms; each
    # avoided [C,k] gather is ~1.1 ms at C=131k)
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    rank = jnp.argsort(order)  # [C] depth rank of each original index
    valid_s = valid

    tx0 = jnp.clip(jnp.floor((mx - rx) / ts), 0, tx_n - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + rx) / ts), 0, tx_n - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - ry) / ts), 0, ty_n - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + ry) / ts), 0, ty_n - 1).astype(jnp.int32)
    if lim_row is not None:
        # valid gaussians have ty0 <= lim_row-1 (their rect starts above
        # the limit); keep ty1 >= ty0 so window arithmetic stays sane for
        # the masked-out rest
        ty1 = jnp.maximum(jnp.minimum(ty1, lim_row - 1), ty0)

    # flexible duplication budget: each Gaussian may cover any w x h tile
    # window with w*h <= M (= max_tiles_w * max_tiles_h); oversized rects
    # shrink their LARGER dimension to fit, centered on the Gaussian's
    # tile. Unlike a per-dimension cap this keeps elongated footprints
    # (e.g. 12x1) exact and lets the budget M - which sets the sort-domain
    # size C*M - be much smaller for the same fidelity.
    cx = jnp.clip(jnp.floor(mx / ts).astype(jnp.int32), tx0, tx1)
    cy = jnp.clip(jnp.floor(my / ts).astype(jnp.int32), ty0, ty1)
    w = jnp.minimum(tx1 - tx0 + 1, m)
    h = jnp.minimum(ty1 - ty0 + 1, m)
    over = w * h > m
    shrink_w = over & (w >= h)
    w = jnp.where(shrink_w, jnp.maximum(m // h, 1), w)
    h = jnp.where(over & jnp.logical_not(shrink_w), jnp.maximum(m // w, 1), h)
    # re-center the (possibly shrunk) window inside the true rect; when
    # nothing shrank the clip bounds collapse to the original corner
    tx0 = jnp.clip(cx - (w - 1) // 2, tx0, tx1 - w + 1)
    ty0 = jnp.clip(cy - (h - 1) // 2, ty0, ty1 - h + 1)
    count = jnp.where(valid_s, w * h, 0)  # [C]

    # population bookkeeping needs only [C] vectors
    if ov_capacity is None:
        ov_capacity = min(c, max(c // 8, 128))
    b_small = max(1, min(small_budget, m))
    flag = valid_s & (count > b_small)
    num_overflow = jnp.sum(flag, dtype=jnp.int32)
    n_gt = jnp.stack(
        [
            jnp.sum(valid_s & (count > bb), dtype=jnp.int32)
            for bb in BUDGET_CANDIDATES
        ]
    )
    rank_bits = max(1, (c - 1).bit_length())
    tile_bits = num_tiles.bit_length()  # ids 0..num_tiles (incl. sentinel)
    # (tile, rank) packs into one i32 key up to C ~ 2M at 800^2; beyond
    # that the sort falls back to num_keys=2 — same ordering, ~same data
    # movement, only a costlier comparator (the two-population domain
    # compaction below is independent of the packing)
    packable = rank_bits + tile_bits <= 31 and not _FORCE_UNPACKABLE
    two_pop = m > b_small and ov_capacity > 0
    want_dense = BWD_REDUCE == "dense"
    # the Pallas binkeys kernel replaces the [C, M] XLA duplicate grid
    # (window tiling + exact test + sentinel keys + counts) — the XLA
    # version measured ~16 ms at 1M Gaussians for ~2 GB of streaming
    # elementwise work
    use_binkeys = (
        BINNING_IMPL == "pallas"
        and two_pop
        and conics is not None
        and not want_dense
    )
    if use_binkeys:
        return _bin_gaussians_binkeys(
            c=c, m=m, ts=ts, tx_n=tx_n, num_tiles=num_tiles,
            b_small=b_small, ov_capacity=ov_capacity,
            rank_bits=rank_bits, packable=packable,
            order=order, rank=rank, valid_s=valid_s, mx=mx, my=my,
            tx0=tx0, ty0=ty0, w=w, h=h, count=count, flag=flag,
            num_overflow=num_overflow, n_gt=n_gt,
            conics=conics, opacities=opacities, interpret=interpret,
        )

    j = jnp.arange(m, dtype=jnp.int32)[None, :]  # [1, M]
    w_safe = jnp.maximum(w, 1)[:, None]
    jy = j // w_safe
    jx = j % w_safe
    tile = (ty0[:, None] + jy) * tx_n + tx0[:, None] + jx  # [C, M]
    live = (j < count[:, None]) & valid_s[:, None]  # [C, M]

    if conics is not None:
        # exact ellipse/tile test: drop duplicates whose contributing
        # ellipse {sigma <= s_max} misses the tile's pixel rectangle (the
        # bounding rectangle overlaps the tile, but for anisotropic /
        # diagonal footprints up to ~half its corner tiles contain no
        # eligible pixel — sigma here matches the kernels' eligibility
        # test alpha = opac*exp(-sigma) >= ALPHA_THRESH exactly, so the
        # pruning is output-exact). The box-constrained minimum of the
        # convex quadratic sigma(d) = 0.5*a*dx^2 + 0.5*c*dy^2 + b*dx*dy
        # is 0 when the mean lies inside the rect, else it lies on one of
        # the 4 edges, each a clamped 1D quadratic — cheap [C, M]
        # elementwise math that shrinks every downstream cost (sort
        # occupancy, feature gather, kernel chunks, gradient scatter).
        from .rasterize_ref import ALPHA_THRESH

        a = conics[:, 0:1]
        b = conics[:, 1:2]
        cc = conics[:, 2:3]
        opa_s = opacities
        s_max = jnp.log(jnp.maximum(opa_s, 1e-12) / ALPHA_THRESH)
        s_max = jnp.clip(s_max, 0.0, 4.5)[:, None]  # [C, 1]
        # tile rect in mean-relative coords [C, M]
        x0 = ((tx0[:, None] + jx) * ts).astype(jnp.float32) - mx[:, None]
        y0 = ((ty0[:, None] + jy) * ts).astype(jnp.float32) - my[:, None]
        x1 = x0 + ts
        y1 = y0 + ts
        a_safe = jnp.maximum(a, 1e-12)
        c_safe = jnp.maximum(cc, 1e-12)

        def sig(dx, dy):
            return 0.5 * a * dx * dx + 0.5 * cc * dy * dy + b * dx * dy

        def edge_x(xe):  # minimize over dy in [y0, y1] at dx = xe
            return sig(xe, jnp.clip(-b * xe / c_safe, y0, y1))

        def edge_y(ye):  # minimize over dx in [x0, x1] at dy = ye
            return sig(jnp.clip(-b * ye / a_safe, x0, x1), ye)

        s_edge = jnp.minimum(
            jnp.minimum(edge_x(x0), edge_x(x1)),
            jnp.minimum(edge_y(y0), edge_y(y1)),
        )
        inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
        s_min = jnp.where(inside, 0.0, s_edge)
        live = live & (s_min <= s_max)

    keys = jnp.where(live, tile, num_tiles).astype(jnp.int32)
    # flat duplicate-grid id orig*M + j; dead lanes get the sentinel C*M
    # so a flat-ascending sort groups each Gaussian's live duplicates
    # contiguously with the dead tail last (see Binning docstring)
    j_grid = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32)[None, :], (c, m))
    base_flat = jnp.arange(c, dtype=jnp.int32)[:, None] * m + j_grid
    flats = jnp.where(live, base_flat, c * m)
    counts = jnp.sum(live, axis=1, dtype=jnp.int32)  # [C]

    if two_pop:
        # TWO-POPULATION sort domain. Measured window-size distribution:
        # w*h <= b_small covers the vast majority of gaussians
        # mid-training, yet the dense grid pays C*M sort entries. Split:
        #   A: [C, b_small] — every gaussian's first cells (covers
        #      small windows exactly);
        #   B: [ov_capacity, M] — big-window gaussians compacted by a
        #      cheap [C] sort, carrying ALL their cells.
        # Flats stay orig*M+j in BOTH populations, so the backward's
        # flat-sorted grouping is unchanged. Big gaussians beyond
        # ov_capacity fall back to their first b_small cells (a
        # bounded approximation; the trainer watches num_overflow and
        # grows ov_frac like the intersection watchdog).
        ov_rank = jnp.cumsum(flag.astype(jnp.int32)) - flag.astype(jnp.int32)
        in_ov = flag & (ov_rank < ov_capacity)
        live_adj = live & (in_ov[:, None] | (j_grid < b_small))
        counts = jnp.sum(live_adj, axis=1, dtype=jnp.int32)

        live_a = live_adj[:, :b_small] & jnp.logical_not(in_ov)[:, None]
        keys_a = jnp.where(
            live_a, tile[:, :b_small], num_tiles
        ).astype(jnp.int32)
        flats_a = jnp.where(live_a, base_flat[:, :b_small], c * m)

        arange_c = jnp.arange(c, dtype=jnp.int32)
        ov_id = jax.lax.sort(jnp.where(in_ov, arange_c, c))[:ov_capacity]
        slot_valid = ov_id < c
        safe_id = jnp.minimum(ov_id, c - 1)
        keys_full = jnp.where(live_adj, tile, num_tiles).astype(jnp.int32)
        keys_b = jnp.where(
            slot_valid[:, None], keys_full[safe_id], num_tiles
        )
        flats_b = jnp.where(
            keys_b < num_tiles, safe_id[:, None] * m + j_grid[:ov_capacity],
            c * m,
        )
        rank_b = rank[safe_id]

        keys_dom = jnp.concatenate(
            [keys_a.reshape(-1), keys_b.reshape(-1)]
        )
        rank_dom = jnp.concatenate(
            [
                jnp.broadcast_to(rank[:, None], (c, b_small)).reshape(-1),
                jnp.broadcast_to(
                    rank_b[:, None], (ov_capacity, m)
                ).reshape(-1),
            ]
        )
        flats_dom = jnp.concatenate(
            [flats_a.reshape(-1), flats_b.reshape(-1)]
        )
        # dense slot id: A slots c*b_small + j, B slots C*b_small + s*M + j
        # — together a PERMUTATION of [0, D), regardless of liveness (dead
        # slots sort to the tail through their sentinel key but keep their
        # true dense id, which is what makes the inverse permutation in
        # the dense backward reduction well-defined)
        dense_dom = jnp.concatenate(
            [
                (
                    arange_c[:, None] * b_small
                    + jnp.arange(b_small, dtype=jnp.int32)[None, :]
                ).reshape(-1),
                (
                    c * b_small
                    + jnp.arange(ov_capacity, dtype=jnp.int32)[:, None] * m
                    + j_grid[:ov_capacity]
                ).reshape(-1),
            ]
        )
        in_ov_out, ov_rank_out = in_ov, ov_rank
    else:
        keys_dom = keys.reshape(-1)
        rank_dom = jnp.broadcast_to(rank[:, None], (c, m)).reshape(-1)
        flats_dom = flats.reshape(-1)
        dense_dom = base_flat.reshape(-1)  # dense domain = the full grid
        in_ov_out = ov_rank_out = None

    want_dense = BWD_REDUCE == "dense"
    payloads = (flats_dom, dense_dom) if want_dense else (flats_dom,)
    if packable:
        # pack (tile, depth-rank) into one int32 key — the comparator
        # orders by tile then by depth within the tile, exactly like a
        # stable sort of depth-sorted duplicates — and carry the FLAT
        # duplicate id as the sort payload (original index = flat // M)
        # so downstream gathers/scatters need no sorted->original
        # translation
        packed = (keys_dom << rank_bits) | rank_dom
        sorted_packed, sorted_flat, *rest = jax.lax.sort(
            (packed,) + payloads, num_keys=1, is_stable=False
        )
        sorted_keys = (sorted_packed >> rank_bits).astype(jnp.int32)
    else:
        sorted_keys, _, sorted_flat, *rest = jax.lax.sort(
            (keys_dom, rank_dom) + payloads,
            num_keys=2,
            is_stable=False,
        )
    sorted_dense = rest[0] if want_dense else None
    sorted_orig = jnp.minimum(sorted_flat // m, c - 1)
    tile_offsets = jnp.searchsorted(
        sorted_keys, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    return Binning(
        order=order,
        isect_orig=sorted_orig,
        isect_flat=sorted_flat,
        isect_tile=sorted_keys,
        tile_offsets=tile_offsets,
        num_isects=tile_offsets[num_tiles],
        counts=counts,
        num_overflow=num_overflow,
        n_gt=n_gt,
        dense=sorted_dense,
        in_ov=in_ov_out,
        ov_rank=ov_rank_out,
    )


def pack_features(
    g9: jnp.ndarray,  # [C, 9] = [means2d | conics | colors | opacity]
    binning: Binning,
    geom: TiledGeometry,
) -> jnp.ndarray:
    """Per-intersection feature matrix [16, I], feature-major, with
    tile-local sigma polynomial coefficients. Differentiable w.r.t. g9.

    TPU gathers are expensive (~10 ns per row regardless of width), so
    the four per-Gaussian arrays are packed into one [C, 9] matrix and
    gathered by ORIGINAL intersection index exactly once."""
    tiles = jnp.minimum(binning.isect_tile, geom.num_tiles - 1)
    ox = (tiles % geom.tiles_x).astype(jnp.float32) * geom.tile_size
    oy = (tiles // geom.tiles_x).astype(jnp.float32) * geom.tile_size

    gi = g9[binning.isect_orig]  # [I, 9] — the one big gather
    m2d = gi[:, 0:2]
    con = gi[:, 2:5]
    col = gi[:, 5:8]
    opa = gi[:, 8]
    # invalid intersections: zero opacity so the kernel skips them
    invalid = binning.isect_tile >= geom.num_tiles
    opa = jnp.where(invalid, 0.0, opa)

    mx = m2d[:, 0] - ox  # tile-local mean
    my = m2d[:, 1] - oy
    a, b, cc = con[:, 0], con[:, 1], con[:, 2]

    # row 6 rides the sigma matmul (basis col 6 = 1): the kernel's MXU
    # pass computes s2 = sigma - log(opac) directly, so alpha =
    # exp(-max(s2, nlo)) needs no separate opac*G multiply. Dead lanes
    # (opa=0) clamp to nlo=27.6 -> alpha <= 1e-12, always ineligible.
    nlopac = -jnp.log(jnp.maximum(opa, 1e-12))
    zero = jnp.zeros_like(mx)
    feats = jnp.stack(
        [
            0.5 * a,  # 0: * px^2
            0.5 * cc,  # 1: * py^2
            b,  # 2: * px*py
            -(a * mx + b * my),  # 3: * px
            -(cc * my + b * mx),  # 4: * py
            0.5 * a * mx * mx + 0.5 * cc * my * my + b * mx * my,  # 5: * 1
            nlopac,  # 6: -log(opacity), folded into sigma (basis col 6 = 1)
            mx,  # 7: payload row (basis col 7 is zero)
            col[:, 0],  # 8
            col[:, 1],  # 9
            col[:, 2],  # 10
            a,  # 11
            b,  # 12
            cc,  # 13
            my,  # 14
            zero,  # 15
        ],
        axis=0,
    )
    return feats


def tile_pixel_basis(geom: TiledGeometry) -> jnp.ndarray:
    """[P_tile, 8] polynomial basis over tile-local pixel centers:
    columns (px^2, py^2, px*py, px, py, 1, 1, 0). Column 6 folds the
    feature matrix's -log(opacity) row into the sigma matmul."""
    ts = geom.tile_size
    px = jnp.arange(ts, dtype=jnp.float32) + 0.5
    py = jnp.arange(ts, dtype=jnp.float32) + 0.5
    pxg, pyg = jnp.meshgrid(px, py, indexing="xy")  # [ts, ts]
    px_f = pxg.reshape(-1)
    py_f = pyg.reshape(-1)
    ones = jnp.ones_like(px_f)
    zeros = jnp.zeros_like(px_f)
    return jnp.stack(
        [px_f * px_f, py_f * py_f, px_f * py_f, px_f, py_f, ones, ones, zeros],
        axis=1,
    )


def tiles_to_image(
    tile_data: jnp.ndarray, geom: TiledGeometry, height: int, width: int
) -> jnp.ndarray:
    """[T, ts*ts, ...] -> [H, W, ...] (crop padding)."""
    ts = geom.tile_size
    x = tile_data.reshape(
        (geom.tiles_y, geom.tiles_x, ts, ts) + tile_data.shape[2:]
    )
    x = jnp.swapaxes(x, 1, 2)  # [ty, ts, tx, ts, ...]
    x = x.reshape(
        (geom.tiles_y * ts, geom.tiles_x * ts) + tile_data.shape[2:]
    )
    return x[:height, :width]


def image_to_tiles(
    img: jnp.ndarray, geom: TiledGeometry, height: int, width: int
) -> jnp.ndarray:
    """[H, W, ...] -> [T, ts*ts, ...] (zero-pad to the tile grid)."""
    ts = geom.tile_size
    pad_h = geom.tiles_y * ts - height
    pad_w = geom.tiles_x * ts - width
    pad = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (img.ndim - 2)
    x = jnp.pad(img, pad)
    x = x.reshape(
        (geom.tiles_y, ts, geom.tiles_x, ts) + img.shape[2:]
    )
    x = jnp.swapaxes(x, 1, 2)  # [ty, tx, ts, ts, ...]
    return x.reshape((geom.num_tiles, ts * ts) + img.shape[2:])


# --------------------------------------------------------------------------
# custom-VJP rasterizer built on the Pallas kernels
# --------------------------------------------------------------------------


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _ov_capacity(c: int, ov_frac: float) -> int:
    # 256-aligned so the dense backward reduction's Pallas group-reduce
    # gets a large power-of-two grid block over the B population
    cap = max(int(c * ov_frac), 128)
    cap = -(-cap // 256) * 256
    return min(c, cap)


def _prepare(
    means2d, conics, colors, opacities, radii, depths,
    height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
    ov_frac: float = 0.125,
    small_budget: int = SMALL_BUDGET,
    interpret: bool | None = None,
    y_limit: jnp.ndarray | None = None,
):
    from .pallas.tile_raster import CHUNK

    geom = image_geometry(height, width, tile_size)
    extents = binning_extents(conics, opacities, radii)
    binning = bin_gaussians(
        means2d, extents, depths, geom, max_tiles_w, max_tiles_h,
        conics=conics, opacities=opacities,
        ov_capacity=_ov_capacity(means2d.shape[0], ov_frac),
        small_budget=small_budget,
        interpret=interpret,
        y_limit=y_limit,
    )
    # the two-population sort domain can be smaller than a large
    # requested cap; clamp (both are static python ints)
    isect_cap = min(isect_cap, binning.isect_flat.shape[0])
    sliced = Binning(
        order=binning.order,
        isect_orig=binning.isect_orig[:isect_cap],
        isect_flat=binning.isect_flat[:isect_cap],
        isect_tile=binning.isect_tile[:isect_cap],
        tile_offsets=jnp.minimum(binning.tile_offsets, isect_cap),
        num_isects=binning.num_isects,
        counts=binning.counts,
        num_overflow=binning.num_overflow,
        # the dense side-channel stays FULL-length: the backward's inverse
        # permutation needs every sort-domain entry (positions beyond the
        # cap map to a guaranteed-zero gradient row)
        dense=binning.dense,
        in_ov=binning.in_ov,
        ov_rank=binning.ov_rank,
    )
    g9 = jnp.concatenate(
        [means2d, conics, colors, opacities[:, None]], axis=1
    )  # [C, 9]
    feats = pack_features(g9, sliced, geom)
    # pad lanes so aligned-down DMA windows never run past the array
    i_pad = -(-isect_cap // CHUNK) * CHUNK + CHUNK
    feats = jnp.pad(feats, ((0, 0), (0, i_pad - feats.shape[1])))
    return geom, sliced, feats


def _tiled_impl(
    means2d, conics, colors, opacities, radii, depths, absgrad_dummy,
    y_limit,
    height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
    interpret, ov_frac=0.125, small_budget=SMALL_BUDGET,
):
    from .pallas.tile_raster import tiled_forward

    geom, binning, feats = _prepare(
        means2d, conics, colors, opacities, radii, depths,
        height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
        ov_frac=ov_frac, small_budget=small_budget, interpret=interpret,
        y_limit=y_limit,
    )
    basis = tile_pixel_basis(geom)
    rgb_t, tfin_t, last_t = tiled_forward(
        feats, binning.tile_offsets, basis, geom.num_tiles,
        interpret=interpret,
    )
    img = tiles_to_image(rgb_t, geom, height, width)  # [H, W, 3]
    final_t = tiles_to_image(tfin_t, geom, height, width)
    return img, final_t, (binning, feats, tfin_t, last_t)


# num_isects rides along as a third (int) output of the custom-VJP core so
# the trainer can watch the intersection capacity for free (no second
# binning pass); its cotangent is float0 and is ignored in the backward.


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16)
)
def _rasterize_tiled_core(
    means2d, conics, colors, opacities, radii, depths, absgrad_dummy,
    y_limit,
    height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
    interpret, ov_frac, small_budget,
):
    img, final_t, (binning, *_rest) = _tiled_impl(
        means2d, conics, colors, opacities, radii, depths, absgrad_dummy,
        y_limit,
        height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
        interpret, ov_frac, small_budget,
    )
    return img, final_t, binning.num_isects


def _core_fwd(
    means2d, conics, colors, opacities, radii, depths, absgrad_dummy,
    y_limit,
    height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
    interpret, ov_frac, small_budget,
):
    img, final_t, (binning, feats, tfin_t, last_t) = _tiled_impl(
        means2d, conics, colors, opacities, radii, depths, absgrad_dummy,
        y_limit,
        height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
        interpret, ov_frac, small_budget,
    )
    residuals = (radii, depths, binning, feats, tfin_t, last_t)
    return (img, final_t, binning.num_isects), residuals


def _core_bwd(
    height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
    interpret, ov_frac, small_budget, residuals, cotangents,
):
    from .pallas.tile_raster import CHUNK, tiled_backward

    (radii, depths, binning, feats, tfin_t, last_t) = residuals
    g_img, g_t, _g_n = cotangents  # num_isects cotangent is float0
    geom = image_geometry(height, width, tile_size)
    basis = tile_pixel_basis(geom)

    gimg_t = jnp.swapaxes(
        image_to_tiles(g_img, geom, height, width), 1, 2
    )  # [T, 3, P]
    gt_t = image_to_tiles(g_t, geom, height, width)  # [T, P]

    dfeats = tiled_backward(
        feats, binning.tile_offsets, basis, gimg_t, gt_t, tfin_t, last_t,
        interpret=interpret,
    )  # [I_pad, 128] ROW-major; rows outside every tile's range are zero

    c = radii.shape[0]
    icap = binning.isect_flat.shape[0]
    m = max_tiles_w * max_tiles_h
    truncated = binning.num_isects > icap
    if binning.dense is not None:
        # DENSE reduction: the sort domain is a permutation of dense
        # duplicate slots (Binning.dense docs). One cheap sort inverts it
        # (q[slot] = tile-order position), one gather moves gradient rows
        # into the dense grid — where each Gaussian's rows are CONTIGUOUS
        # with a static stride, so the per-Gaussian sum is a reshape-sum.
        # Replaces the scan path's flat sort + permutation gather +
        # log-step segmented scan + feature-major transpose + starts
        # gather (the transpose + starts gather alone measured ~49 ms at
        # 1M Gaussians).
        d_total = binning.dense.shape[0]
        _, q = jax.lax.sort(
            (binning.dense, jnp.arange(d_total, dtype=jnp.int32)),
            num_keys=1,
            is_stable=False,
        )
        # positions >= icap (dead slots, truncated tail) and rows the
        # kernel never wrote are zeros: dfeats rows [icap, i_pad) are
        # untouched by every tile window (tile_offsets are clamped to
        # icap and icap is CHUNK-aligned), so clamping to icap lands on a
        # guaranteed-zero row
        # gather FULL 128-lane rows (composing a lane slice into the
        # gather — dfeats[q, :12] — lowers to a ~200x slower XLA gather:
        # measured 14.5 s vs 75 ms at D=6M); reduce at full width in the
        # streaming Pallas kernel and slice the 12 live lanes at the end
        # (XLA's reshape+reduce for this pattern measured ~15x off HBM
        # bandwidth)
        from .pallas.group_reduce import group_reduce

        # bf16 hi/lo rows (tile_raster.GRAD_DTYPE): gathers move 256 B
        # rows; reductions accumulate in f32 per lane, and the final
        # decode adds the hi + lo lanes
        rows = dfeats[jnp.minimum(q, icap)]  # [D, 128] bf16
        if binning.in_ov is not None:
            # two-population: D = C*b_small + ov_cap*M (same statics the
            # binning used)
            ov_cap = _ov_capacity(c, ov_frac)
            b_eff = (d_total - ov_cap * m) // c
            dsum128 = group_reduce(
                rows[: c * b_eff], b_eff, interpret=interpret
            )
            ov_sum = group_reduce(
                rows[c * b_eff :], m, interpret=interpret
            )
            # fold B sums back by GATHER (each gaussian knows its B slot
            # via the cumsum rank): ~4x cheaper than the slot->gaussian
            # scatter at this scale
            fold = ov_sum[jnp.minimum(binning.ov_rank, ov_cap - 1)]
            dsum128 = dsum128 + jnp.where(
                binning.in_ov[:, None], fold, 0.0
            )
        else:
            dsum128 = group_reduce(rows, m, interpret=interpret)
        from .pallas.tile_raster import grad_rows_to_f32

        dsum = jnp.where(truncated, 0.0, grad_rows_to_f32(dsum128))
        v_m2d = dsum[:, 0:2]
        v_conic = dsum[:, 2:5]
        v_opac = dsum[:, 5]
        v_color = dsum[:, 6:9]
        v_abs = dsum[:, 9:11]
        zero_radii = jnp.zeros_like(radii)
        zero_depths = jnp.zeros_like(depths)
        return (
            v_m2d, v_conic, v_color, v_opac, zero_radii, zero_depths,
            v_abs, jnp.zeros((), jnp.float32),
        )
    # Reduce per-intersection rows to per-Gaussian rows WITHOUT a
    # duplicate-index scatter-add (measured 15 ns/row on chip — the single
    # most expensive op of the old backward). Instead:
    #   1. sort (flat_id, iota): groups each Gaussian's <=M rows
    #      contiguously in flat order, dead lanes (flat = C*M) last;
    #   2. one FULL-WIDTH I-row gather into that order (row-major; a
    #      12-lane-sliced source lowers to a ~1.7x slower gather, and
    #      the round-2 feature-major variant paid two [12, I]
    #      transposes — measured chain 115 ms vs 98 ms at icap=2.56M);
    #   3. segmented log-step suffix scan over rows sums each group onto
    #      its first row (<=M rows per group => ceil(log2 M) passes);
    #   4. gather the C group-start rows (positions = exclusive cumsum of
    #      the binning's live counts).
    # Exact whenever num_isects <= isect_cap; on a truncated step the
    # group starts would misalign, so the gradient is zeroed (the
    # capacity watchdog recompiles with a larger cap — one lost step,
    # never a corrupted one; the old scatter path silently dropped the
    # truncated tail's gradients instead).
    flat_asc, p = jax.lax.sort(
        (binning.isect_flat, jnp.arange(icap, dtype=jnp.int32)),
        num_keys=1,
        is_stable=False,
    )
    g = flat_asc // m  # [I] group id (dead lanes -> c)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(binning.counts)[:-1]]
    )
    have = (binning.counts > 0) & jnp.logical_not(truncated)
    if BWD_REDUCE == "pallas":
        from .pallas.segments import R as SEG_R
        from .pallas.segments import monotone_expand, segsum_compact
        from .pallas.tile_raster import grad_rows_to_f32

        # pad the flat-sorted domain to the segment kernels' block size
        # BY PADDING THE GATHER INDICES (positions >= icap address the
        # kernel's guaranteed-zero tail rows), so the [I, 128] gather
        # output is produced directly at the padded size — no second
        # full-size pad copy coexisting with it
        i_seg = -(-icap // SEG_R) * SEG_R
        p_pad = jnp.pad(p, (0, i_seg - icap), constant_values=icap)
        rows = dfeats[p_pad]  # [i_seg, 128] bf16, orig-grouped
        g_pad = jnp.pad(g, (0, i_seg - icap), constant_values=c)
        # groups = gaussians + the dead-sentinel group
        compact = segsum_compact(
            rows, g_pad, interpret=interpret, max_groups=c + 1
        )

        present = binning.counts > 0
        rank = jnp.cumsum(present.astype(jnp.int32)) - present.astype(
            jnp.int32
        )
        c_seg = -(-c // SEG_R) * SEG_R
        # pad ranks with the total (keeps the monotone stride <= 1
        # contract), padding marked absent
        n_valid = rank[-1] + present[-1].astype(jnp.int32)
        rank = jnp.concatenate(
            [rank, jnp.full((c_seg - c,), 1, jnp.int32) * n_valid]
        )
        present_pad = jnp.pad(present, (0, c_seg - c))
        dsum128 = monotone_expand(
            compact, rank, present_pad, interpret=interpret
        )[:c]
        dsum = jnp.where(truncated, 0.0, grad_rows_to_f32(dsum128))
        v_m2d = dsum[:, 0:2]
        v_conic = dsum[:, 2:5]
        v_opac = dsum[:, 5]
        v_color = dsum[:, 6:9]
        v_abs = dsum[:, 9:11]
        zero_radii = jnp.zeros_like(radii)
        zero_depths = jnp.zeros_like(depths)
        return (
            v_m2d, v_conic, v_color, v_opac, zero_radii, zero_depths,
            v_abs, jnp.zeros((), jnp.float32),
        )
    from .pallas.tile_raster import grad_rows_to_f32

    if BWD_REDUCE == "band" and m <= 128:
        # one-pass Pallas band segsum: per-block MXU matmul computes the
        # segmented suffix sums directly (groups are contiguous and
        # <= m <= 128 rows, so a 128-row lookahead window covers every
        # suffix; parallel pipelined grid, no carries, no RMW windows —
        # unlike the demoted segsum_compact). Replaces the XLA log-step
        # scan whose ceil(log2 m) full-array f32[I,128] add passes +
        # materialized shifted slices measured ~34 ms of the 158 ms
        # 1M-Gaussian step (fusion.20-23 + slice.135-141 in the r5 HLO
        # trace).
        from .pallas.segments import LOOK as SEG_LOOK
        from .pallas.segments import R as SEG_R
        from .pallas.segments import segsum_band

        i_band = -(-icap // SEG_R) * SEG_R
        # positions >= icap address the backward kernel's guaranteed-zero
        # tail rows; their group id joins the dead-sentinel group c
        p_pad = jnp.pad(
            p, (0, i_band + SEG_LOOK - icap), constant_values=icap
        )
        g_pad = jnp.pad(
            g, (0, i_band + SEG_LOOK - icap), constant_values=c
        )
        rows_b = dfeats[p_pad]  # [i_band + LOOK, 128] bf16, orig-grouped
        sums = segsum_band(rows_b, g_pad, interpret=interpret)
        dsum = jnp.where(
            have[:, None],
            grad_rows_to_f32(sums[jnp.minimum(starts, icap - 1)]),
            0.0,
        )  # [C, 12]
    # the scan layout is scale-dependent (icap is static, so this is a
    # trace-time switch): row-major full-width wins at large icap
    # (measured 169.9 vs 188.1 ms/step at 1M Gaussians — no [12, I]
    # transposes, faster gather), but LOSES at small icap where XLA
    # fuses the feature-major variant better (38.7 vs 29.3 ms at 100k —
    # the round-2 "wide-gather" negative result)
    elif icap >= 1_500_000:
        # bf16 row gather (256 B/row), f32 accumulation in the scan
        rows = dfeats[p].astype(jnp.float32)  # [I, 128] orig-grouped
        k = 1
        while k < m:
            g_ahead = jnp.concatenate(
                [g[k:], jnp.full((k,), -1, jnp.int32)]
            )
            same = (g_ahead == g)[:, None]
            rows_ahead = jnp.concatenate(
                [rows[k:], jnp.zeros((k, rows.shape[1]), rows.dtype)],
                axis=0,
            )
            rows = rows + jnp.where(same, rows_ahead, 0.0)
            k *= 2
        dsum = jnp.where(
            have[:, None],
            grad_rows_to_f32(rows[jnp.minimum(starts, icap - 1)]),
            0.0,
        )  # [C, 12]
    else:
        # decode hi/lo lanes ONCE into a compact [I, 12] f32 matrix (one
        # streaming pass), then gather in the sliced form XLA fuses best
        # at small icap (the round-3 fast path; a full-width gather here
        # measured +6.7 ms at the 100k point)
        dec = grad_rows_to_f32(dfeats[:icap])  # [I, 12] f32
        rows = dec[p]  # [I, 12] orig-grouped
        rt = jnp.swapaxes(rows, 0, 1)  # [12, I] feature-major
        k = 1
        while k < m:
            g_ahead = jnp.concatenate(
                [g[k:], jnp.full((k,), -1, jnp.int32)]
            )
            same = (g_ahead == g)[None, :]
            rt_ahead = jnp.concatenate(
                [rt[:, k:], jnp.zeros((rt.shape[0], k), rt.dtype)], axis=1
            )
            rt = rt + jnp.where(same, rt_ahead, 0.0)
            k *= 2
        sums = jnp.swapaxes(rt, 0, 1)  # [I, 12]; sums at group starts
        dsum = jnp.where(
            have[:, None], sums[jnp.minimum(starts, icap - 1)], 0.0
        )  # [C, 12]

    v_m2d = dsum[:, 0:2]
    v_conic = dsum[:, 2:5]
    v_opac = dsum[:, 5]
    v_color = dsum[:, 6:9]
    v_abs = dsum[:, 9:11]
    zero_radii = jnp.zeros_like(radii)
    zero_depths = jnp.zeros_like(depths)
    return (
        v_m2d, v_conic, v_color, v_opac, zero_radii, zero_depths, v_abs,
        jnp.zeros((), jnp.float32),
    )


_rasterize_tiled_core.defvjp(_core_fwd, _core_bwd)


def rasterize_tiled(
    means2d, conics, colors, opacities, depths, background, absgrad_dummy,
    height, width, *, radii,
    tile_size: int = DEFAULT_TILE,
    max_tiles_w: int = DEFAULT_MAX_TILES_W,
    max_tiles_h: int = DEFAULT_MAX_TILES_H,
    isect_mult: int = 3,
    interpret: bool | None = None,
    return_isects: bool = False,
    ov_frac: float = 0.125,
    small_budget: int = SMALL_BUDGET,
    y_limit: jnp.ndarray | None = None,  # traced rows: bin/raster only
    # rows [0, y_limit) (adaptive stripe sharding, parallel/shard.py)
):
    """Tiled rasterization with the unified rasterizer signature (see
    ``models/render.py``). Returns (image [H,W,3], alpha [H,W]) — plus the
    binned intersection count when ``return_isects`` (the trainer's
    capacity watchdog reads it through the loss dict at no extra cost)."""
    if interpret is None:
        interpret = _interpret_default()
    c = means2d.shape[0]
    # fractional isect_mult gives CHUNK-granular capacity: the kernel,
    # gather, and scatter costs all scale with the cap, and rounding up to
    # a whole multiple of C can waste >50% of those lanes
    from .pallas.tile_raster import CHUNK as _CHUNK

    isect_cap = -(-max(1, int(c * isect_mult)) // _CHUNK) * _CHUNK
    # hard safety net at the one place isect_cap is actually derived:
    # whatever the autotune/watchdog arithmetic produced (rounding can
    # exceed their own clamp), the gradient-row buffer must stay inside
    # int32 DMA byte addressing — silently capping here trades (watched,
    # recoverable) truncation for a worker-killing kernel fault
    isect_cap = min(isect_cap, (ISECT_ROW_LIMIT // _CHUNK) * _CHUNK)
    # zero-opacity Gaussians (dead capacity slots, alive-mask culls) must
    # not be binned: dead slots project to unit-scale blobs with large
    # radii and would exhaust the intersection capacity, truncating real
    # content from deep tiles
    radii = jnp.where(opacities > 0.0, radii, 0.0)
    if y_limit is None:
        # full-window limit: (my - ry) < height excludes only gaussians
        # entirely below the image, which the exact tile test drops
        # anyway — a single core signature covers both modes
        y_limit = jnp.asarray(float(height), jnp.float32)
    img, final_t, num_isects = _rasterize_tiled_core(
        means2d, conics, colors, opacities, radii, depths, absgrad_dummy,
        jnp.asarray(y_limit, jnp.float32),
        height, width, tile_size, max_tiles_w, max_tiles_h, isect_cap,
        interpret, ov_frac, small_budget,
    )
    img = img + final_t[..., None] * background[None, None, :]
    if return_isects:
        return img, 1.0 - final_t, num_isects
    return img, 1.0 - final_t


def make_isect_counter(
    tile_size: int = DEFAULT_TILE,
    max_tiles_w: int = DEFAULT_MAX_TILES_W,
    max_tiles_h: int = DEFAULT_MAX_TILES_H,
    ov_frac: float = 0.125,
    small_budget: int = SMALL_BUDGET,
):
    """Jittable (params, alive, camera) -> int32 [2 + len(
    BUDGET_CANDIDATES)]: [num_isects, num_overflow, *n_gt], where n_gt[i]
    counts gaussians whose tile window exceeds BUDGET_CANDIDATES[i].
    Used by the trainer to monitor the intersection capacity and the
    overflow-population occupancy, and to autotune capacity, ov_frac and
    the small-population budget."""
    import jax as _jax

    @functools.partial(
        _jax.jit, static_argnames=("height", "width")
    )
    def count(params, alive, w2c, K, *, height, width):
        scales = jnp.exp(params.log_scales)
        opac = jax.nn.sigmoid(params.logit_opacities) * alive.astype(
            jnp.float32
        )
        intr = CameraIntrinsics.from_K(K, width, height)
        proj = project_gaussians(
            params.means, params.quats, scales, w2c, intr
        )
        radii = jnp.where(opac > 0.0, proj.radii, 0.0)
        geom = image_geometry(height, width, tile_size)
        extents = binning_extents(proj.conics, opac, radii)
        binning = bin_gaussians(
            proj.means2d, extents, proj.depths, geom, max_tiles_w,
            max_tiles_h, conics=proj.conics, opacities=opac,
            ov_capacity=_ov_capacity(params.means.shape[0], ov_frac),
            small_budget=small_budget,
            # rasterize_tiled applies an implicit y_limit=height
            # (excludes pad-band gaussians); count identically
            y_limit=jnp.asarray(float(height), jnp.float32),
        )
        return jnp.concatenate(
            [
                jnp.stack([binning.num_isects, binning.num_overflow]),
                binning.n_gt,
            ]
        )

    return count


def make_tiled_render_fn(
    tile_size: int = DEFAULT_TILE,
    max_tiles_w: int = DEFAULT_MAX_TILES_W,
    max_tiles_h: int = DEFAULT_MAX_TILES_H,
    isect_mult: int = 3,
    interpret: bool | None = None,
    ov_frac: float = 0.125,
    small_budget: int = SMALL_BUDGET,
):
    """Render function (models/render.py signature) using the tiled Pallas
    rasterizer."""
    from ..models.render import render as _render

    rasterizer = functools.partial(
        rasterize_tiled,
        tile_size=tile_size,
        max_tiles_w=max_tiles_w,
        max_tiles_h=max_tiles_h,
        isect_mult=isect_mult,
        interpret=interpret,
        return_isects=True,
        ov_frac=ov_frac,
        small_budget=small_budget,
    )
    return functools.partial(_render, rasterizer=rasterizer)
