"""Pallas TPU kernels for sorted-segment reduction at HBM-streaming speed.

The tiled rasterizer's backward must reduce ~2.5M per-intersection
gradient rows (flat-sorted: each Gaussian's <=M rows contiguous) to
per-Gaussian rows. The XLA composition (log-step masked shifts + a
C-row gather of the group-start rows) measured 71 ms + 45 ms at the
1M-Gaussian regime — both ~15-30x off memory bandwidth. These two
kernels stream instead:

- :func:`segsum_compact`: one pass over the rows; per-block segmented
  suffix sums via a masked bf16 MXU matmul (hi/lo split, like
  ``tile_raster``'s scans); group-total rows written COMPACTED (one row
  per present group, ascending group id) through 8-aligned
  read-merge-write windows (the grid runs sequentially, so boundary
  tiles shared between consecutive blocks are race-free).
- :func:`monotone_expand`: out[c] = compact[rank[c]] for a monotone
  rank with stride <= 1 (rank = exclusive cumsum of group presence), as
  a per-block one-hot MXU matmul against a bounded input window —
  replacing a C-row XLA gather (~29 ns/row for monotone gathers).

Layout notes (Mosaic): per-row metadata (group ids, ranks) is fed
LANE-major ([nblocks, R] windows — 128-multiple lanes) and moved to
sublane orientation in-kernel with an identity-matmul "transpose"
(values < 2^24 are f32-exact); carries live as [1, 1] VMEM vectors so
no scalar extraction from vector memory is needed. Both kernels run
under ``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
R = 512  # rows per block
LOOK = 128  # segsum_band lookahead rows (bounds the segment length)
_MASK30 = (1 << 30) - 1


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm(mask_bf16, x):
    """mask @ x with f32 accumulation. For f32 ``x``: bf16 hi/lo split
    (mask is 0/1, exact in bf16). For bf16 ``x`` (the rasterizer's
    hi/lo-lane gradient rows): one matmul — the input IS already the
    decomposition, spread across lanes, and each lane accumulates
    independently in f32."""
    dims = (((1,), (0,)), ((), ()))
    if x.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            mask_bf16, x, dims,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
    hi, lo = _hi_lo(x)
    # precision must be DEFAULT: Mosaic rejects bf16 operands with an
    # fp32 contract_precision ("Bad lhs type"); accumulation is still
    # f32 via preferred_element_type (same rule as tile_raster._scan_mm)
    return jax.lax.dot_general(
        mask_bf16, hi, dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        mask_bf16, lo, dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _lanes_to_sublanes(v_lane: jnp.ndarray) -> jnp.ndarray:
    """[1, R] f32 -> [R, 1] f32: broadcast along sublanes, then an
    iota-masked row reduction (Mosaic rejects the transposed-contraction
    matmul form with "Bad lhs type")."""
    r = v_lane.shape[1]
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
    j_lane = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
    g = jnp.broadcast_to(v_lane, (r, r))
    return jnp.sum(
        jnp.where(i_sub == j_lane, g, 0.0), axis=1, keepdims=True
    )  # [R, 1]


def _lane_prefix_sum_excl(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix sum along lanes of a [1, R] f32 (log-step
    shifts; counts stay f32-exact)."""
    r = x.shape[1]
    # shift right by one for exclusivity
    x = jnp.concatenate([jnp.zeros((1, 1), x.dtype), x[:, :-1]], axis=1)
    k = 1
    while k < r:
        pad = jnp.zeros((1, k), x.dtype)
        x = x + jnp.concatenate([pad, x[:, :-k]], axis=1)
        k *= 2
    return x


def _segsum_kernel(
    base_ref,  # scalar prefetch [nb+1]: #group-starts before each block
    rows_ref,  # VMEM block [R, LANES] f32 (reverse-indexed)
    glane_ref,  # VMEM block [1, 1, R] i32: group id | (is_start << 30)
    out_ref,  # HBM [n_out_pad, LANES] f32 (compacted group sums)
    wbuf_ref,  # VMEM [R + 8, LANES] output window
    carry_sum,  # VMEM [1, LANES]
    carry_g,  # VMEM [1, 1] f32 (group id of the previous block's head)
    sem,  # DMA semaphore (output RMW)
):
    nb = pl.num_programs(0)
    kk = pl.program_id(0)
    k = nb - 1 - kk  # suffix sums: process blocks in reverse

    @pl.when(kk == 0)
    def _():
        carry_sum[...] = jnp.zeros_like(carry_sum)
        carry_g[...] = jnp.full_like(carry_g, -1.0)

    base = base_ref[k]
    wpos = (base // 8) * 8
    off = base - wpos
    w_copy_in = pltpu.make_async_copy(
        out_ref.at[pl.ds(pl.multiple_of(wpos, 8), R + 8), :],
        wbuf_ref,
        sem,
    )
    w_copy_in.start()

    packed_l = glane_ref[0]  # [1, R] i32
    g_l = (packed_l & _MASK30).astype(jnp.float32)  # [1, R]
    st_l = (packed_l >> 30).astype(jnp.float32)  # [1, R]
    g_s = _lanes_to_sublanes(g_l)  # [R, 1] f32

    rows = rows_ref[...]  # [R, LANES]

    # within-block segmented suffix sums: mask[i, j] = j >= i and same
    # group (groups are contiguous, so equality == same segment)
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    j_lane = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    mask = ((j_lane >= i_sub) & (g_l == g_s)).astype(jnp.bfloat16)
    s = _mm(mask, rows)  # [R, LANES]

    # add the carry (suffix of this block's tail group in later blocks)
    s = s + jnp.where(g_s == carry_g[...], 1.0, 0.0) * carry_sum[...]
    carry_sum[...] = s[0:1, :]
    carry_g[...] = g_s[0:1, 0:1]

    # compact start rows: dest = off + (#starts above, exclusive),
    # via a log-step lane prefix (f32-exact counts)
    rank_l = _lane_prefix_sum_excl(st_l)  # [1, R]
    dest_l = rank_l + off.astype(jnp.float32)  # [1, R] in-window dest
    d_sub = jax.lax.broadcasted_iota(jnp.int32, (R + 8, R), 0).astype(
        jnp.float32
    )
    # oh[d, i] = is_start[i] & (dest[i] == d)
    oh = ((d_sub == dest_l) & (st_l > 0.0)).astype(jnp.bfloat16)
    win_new = _mm(oh, s)  # [R+8, LANES]
    wrote = (
        jnp.sum(oh.astype(jnp.float32), axis=1, keepdims=True) > 0.0
    )  # [R+8, 1]

    w_copy_in.wait()
    wbuf_ref[...] = jnp.where(wrote, win_new, wbuf_ref[...])
    w_copy_out = pltpu.make_async_copy(
        wbuf_ref,
        out_ref.at[pl.ds(pl.multiple_of(wpos, 8), R + 8), :],
        sem,
    )
    w_copy_out.start()
    w_copy_out.wait()


@functools.partial(
    jax.jit, static_argnames=("interpret", "max_groups")
)
def segsum_compact(
    rows: jnp.ndarray,  # [I_pad, LANES] f32, flat-sorted
    g: jnp.ndarray,  # [I_pad] i32 group ids, non-decreasing
    interpret: bool = False,
    max_groups: int | None = None,
):
    """Per-group sums of ``rows``, compacted to one row per present
    group (ascending group id). Rows past the number of present groups
    are unspecified. ``max_groups`` bounds the output allocation (the
    caller usually knows #groups << #rows — at the 3M-Gaussian regime an
    I_pad-sized output would waste multiple GB of HBM)."""
    i_pad, lanes = rows.shape
    if i_pad % R:
        raise ValueError(f"rows {i_pad} must be a multiple of {R}")
    nb = i_pad // R
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), g[:-1]])
    is_start = (g != prev).astype(jnp.int32)
    glane = (g | (is_start << 30)).reshape(nb, R)
    starts_per_block = is_start.reshape(nb, R).sum(axis=1)
    base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(starts_per_block, dtype=jnp.int32)]
    )
    # every block's RMW window [align8(base), +R+8) must fit
    n_out_pad = (
        i_pad + 8
        if max_groups is None
        else min(-(-(max_groups + R + 8) // 8) * 8, i_pad + 8)
    )

    nb_static = nb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            # reverse index maps: the grid walks blocks high-to-low for
            # the suffix carry; the pipeline DMAs whole aligned blocks
            pl.BlockSpec((R, lanes), lambda i, *_: (nb_static - 1 - i, 0)),
            # 3-D so the last two block dims equal the array dims (TPU
            # BlockSpec constraint: sublane blocks must be 8-divisible
            # OR whole-dimension)
            pl.BlockSpec(
                (1, 1, R), lambda i, *_: (nb_static - 1 - i, 0, 0)
            ),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((R + 8, lanes), jnp.float32),
            pltpu.VMEM((1, lanes), jnp.float32),
            pltpu.VMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_out_pad, lanes), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(base, rows, glane.reshape(nb, 1, R))[0]


def _segsum_band_kernel(
    rows_ref,  # VMEM block [R, LANES] (bf16 or f32), flat-sorted order
    look_ref,  # VMEM block [LOOK, LANES]: the next LOOK rows
    gmain_ref,  # VMEM block [1, 1, R] f32 group ids of this block's rows
    glook_ref,  # VMEM block [1, 1, LOOK] f32 ids of the lookahead rows
    out_ref,  # VMEM block [R, LANES] f32: segmented suffix sums
):
    g_l = jnp.concatenate(
        [gmain_ref[0], glook_ref[0]], axis=1
    )  # [1, R+LOOK]
    g_s = _lanes_to_sublanes(gmain_ref[0])  # [R, 1]

    # mask[i, j] = j >= i and same group. Segments are contiguous and at
    # most LOOK rows long (the caller's contract), so same-group & j >= i
    # implies j - i < LOOK: no explicit band test is needed and every
    # segment's suffix fits the lookahead window.
    i_sub = jax.lax.broadcasted_iota(jnp.int32, (R, R + LOOK), 0)
    j_lane = jax.lax.broadcasted_iota(jnp.int32, (R, R + LOOK), 1)
    mask = ((j_lane >= i_sub) & (g_l == g_s)).astype(jnp.bfloat16)
    rows_ext = jnp.concatenate([rows_ref[...], look_ref[...]], axis=0)
    out_ref[...] = _mm(mask, rows_ext)  # [R, LANES] f32


@functools.partial(jax.jit, static_argnames=("interpret",))
def segsum_band(
    rows: jnp.ndarray,  # [nb*R + LOOK, LANES] bf16/f32, flat-sorted
    g: jnp.ndarray,  # [nb*R + LOOK] i32 group ids, non-decreasing
    interpret: bool = False,
):
    """Segmented suffix sums over flat-sorted rows: out[i] = sum of
    rows[j] for j >= i with g[j] == g[i] — each group's total lands on
    its FIRST row, exactly the contract of the XLA log-step scan in
    ``rasterize_tiled._core_bwd`` (the consumer gathers group-start
    rows). Requires every group to span at most ``LOOK`` rows (the
    rasterizer guarantees <= max_tiles^2 <= 121 duplicates per Gaussian);
    longer groups (e.g. the dead-sentinel tail) get truncated sums, which
    only ever land on rows no consumer reads.

    Unlike :func:`segsum_compact` there is no sequential carry and no
    read-modify-write output window — every block's output is an
    independent [R, LANES] tile (its suffix extends into a LOOK-row
    lookahead read), so the grid pipelines at full overlap. One MXU
    matmul per block replaces ceil(log2 M) full-array XLA add passes
    plus their materialized shifted slices (measured 34 ms of the
    158 ms 1M-Gaussian step)."""
    i_k, lanes = rows.shape
    if (i_k - LOOK) % R:
        raise ValueError(f"rows {i_k} must be nb*{R} + {LOOK}")
    nb = (i_k - LOOK) // R
    gf = g.astype(jnp.float32)
    # pad to (nb+1)*R so the strided lookahead reshape below always fits
    gf_pad = jnp.concatenate(
        [gf, jnp.full(((nb + 1) * R - i_k,), -1.0, jnp.float32)]
    )
    gmain = gf_pad[: nb * R].reshape(nb, 1, R)
    # glook[b] = g[(b+1)*R : (b+1)*R + LOOK]
    glook = gf_pad[R:].reshape(nb, R)[:, :LOOK].reshape(nb, 1, LOOK)

    nb4 = R // LOOK  # lookahead block-index stride in LOOK-row units
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((R, lanes), lambda b: (b, 0)),
            pl.BlockSpec((LOOK, lanes), lambda b: ((b + 1) * nb4, 0)),
            pl.BlockSpec((1, 1, R), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, LOOK), lambda b: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((R, lanes), lambda b: (b, 0))],
    )
    return pl.pallas_call(
        _segsum_band_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * R, lanes), jnp.float32)
        ],
        interpret=interpret,
    )(rows, rows, gmain, glook)[0]


def _expand_kernel(
    wstart_ref,  # scalar prefetch [nbc+1]: aligned window start per
    # block, then the number of VALID input rows (window rows beyond it
    # hold unspecified bits — 0 * garbage in the matmul would poison
    # every output of the dot product)
    compact_ref,  # HBM [n_in_pad, LANES]
    rlane_ref,  # VMEM block [1, 1, R] i32: rank | (present << 30)
    out_ref,  # VMEM block [R, LANES]
    cbuf_ref,  # VMEM [R + 8, LANES]
    sem,  # DMA semaphore
):
    b = pl.program_id(0)
    nbc = pl.num_programs(0)
    w = wstart_ref[b]
    n_valid = wstart_ref[nbc]
    c_copy = pltpu.make_async_copy(
        compact_ref.at[pl.ds(pl.multiple_of(w, 8), R + 8), :],
        cbuf_ref,
        sem,
    )
    c_copy.start()

    packed = rlane_ref[0]  # [1, R] i32
    rank_l = (packed & _MASK30).astype(jnp.float32) - w.astype(jnp.float32)
    pres_l = (packed >> 30).astype(jnp.float32)  # [1, R]
    # oh[c, s] = present[c] & (rank[c] == s): rank per output SUBLANE
    rank_s = _lanes_to_sublanes(rank_l)  # [R, 1]
    pres_s = _lanes_to_sublanes(pres_l)  # [R, 1]
    s_lane = jax.lax.broadcasted_iota(jnp.int32, (R, R + 8), 1).astype(
        jnp.float32
    )
    oh = ((s_lane == rank_s) & (pres_s > 0.0)).astype(jnp.bfloat16)

    c_copy.wait()
    row_pos = w + jax.lax.broadcasted_iota(jnp.int32, (R + 8, 1), 0)
    window = jnp.where(row_pos < n_valid, cbuf_ref[...], 0.0)
    out_ref[...] = _mm(oh, window)


@functools.partial(jax.jit, static_argnames=("interpret",))
def monotone_expand(
    compact: jnp.ndarray,  # [n_in, LANES] f32
    rank: jnp.ndarray,  # [C_pad] i32 monotone, stride <= 1
    present: jnp.ndarray,  # [C_pad] bool
    interpret: bool = False,
):
    """out[c] = present[c] ? compact[rank[c]] : 0 for a monotone rank
    whose per-row increment is 0 or 1 (each 512-row output block reads a
    bounded 520-row input window)."""
    c_pad = rank.shape[0]
    lanes = compact.shape[1]
    if c_pad % R:
        raise ValueError(f"rank length {c_pad} must be a multiple of {R}")
    nbc = c_pad // R
    rlane = (
        rank | (present.astype(jnp.int32) << 30)
    ).reshape(nbc, R)
    n_valid = rank[-1] + present[-1].astype(jnp.int32)
    wstart = jnp.concatenate(
        [(rank[::R] // 8) * 8, n_valid[None]]
    )  # [nbc + 1]
    # the input must cover every window [wstart, wstart + R + 8)
    n_in_pad = -(-(compact.shape[0] + R + 8) // 8) * 8
    compact = jnp.pad(compact, ((0, n_in_pad - compact.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbc,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 1, R), lambda b, *_: (b, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((R, lanes), lambda b, *_: (b, 0))],
        scratch_shapes=[
            pltpu.VMEM((R + 8, lanes), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((c_pad, lanes), jnp.float32)],
        interpret=interpret,
    )(wstart, compact, rlane.reshape(nbc, 1, R))[0]
