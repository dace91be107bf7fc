"""Pallas TPU kernels: per-tile front-to-back compositing, forward + backward.

Replaces the CUDA rasterize kernels of the reference's external dependency
(behavioral contract at ``/root/reference/model/gaussian.py:353-374``; the
compositing/backward math matches ``ops/rasterize_ref.py``, the oracle these
kernels are tested against).

Data layout (dictated by TPU tiling: VMEM/HBM tiles are (8 sublanes, 128
lanes), and DMA windows must be 128-lane sized and 128-aligned):
- per-intersection features are **feature-major** ``[16, I]``: feature rows
  on sublanes, intersections on lanes, so a chunk is a ``[:, 128]`` window;
  chunk starts are aligned down to 128 with per-lane range masking;
- work arrays are ``[P, CH] = [tile_pixels, 128]``: pixels on sublanes,
  intersections on lanes;
- sigma is the MXU matmul ``basis [P, 8] @ poly [8, CH]`` against
  tile-local polynomial coefficients (f32-exact in local coordinates);
- in-chunk front-to-back ordering uses log-step (Hillis-Steele) scans along
  the lane axis (lane shifts via concatenate — no atomics, no serial loop);
- feature-row extraction uses iota-masked sums (unaligned sublane slicing
  is not generally available in Mosaic);
- the backward walks chunks in reverse, recovers transmittance by division
  (alpha clamped at 0.999 keeps 1-alpha >= 1e-3), reduces over pixels on
  the MXU, transposes each gradient chunk in-register and writes a
  ROW-major [I, 128] output (the consumer's permutation gather reads
  contiguous rows), read-merge-writing aligned boundary windows shared
  with neighboring tiles (grid programs run sequentially in ascending
  tile order, making this race-free).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rasterize_ref import ALPHA_CLAMP, ALPHA_THRESH, T_EPS

# Padding/alignment quantum for the feature matrix (max of the per-kernel
# chunk sizes). 128 measured best for BOTH kernels: 256 in the forward
# costs +2.7 ms (coarser early-exit + more out-of-range lanes per tile at
# ~600 isects/tile), and 256 in the backward exceeds the 16 MB
# scoped-VMEM limit.
CHUNK = 128
FWD_CHUNK = 128
BWD_CHUNK = 128
NUM_FEATURES = 16
# The tile-local polynomial expansion of sigma carries ~1e-4 cancellation
# error; a hard `sigma >= 0` test would drop pixels right at a Gaussian's
# center. Accept slightly-negative sigma and clamp the exponent instead
# (genuinely broken conics produce large-negative sigma and still fail).
SIGMA_EPS = 1e-3
# feature rows [16, I]: 0-5 sigma poly coeffs (px2, py2, pxpy, px, py, 1);
# row 6 is -log(opacity) with basis col 6 = 1 (the sigma matmul computes
# s2 = sigma - log(opac), so alpha = exp(-max(s2, nlo)) costs no opacity
# multiply); row 7 multiplies a ZERO basis column and carries mx as
# payload; 8,9,10 rgb; 11,12,13 conic a,b,c; 14 my; 15 pad. Two f32
# sublane tiles per 128-lane window.
ROW_OPACITY = 6  # -log(opacity), in the poly group [0:8]
ROW_MX = 7  # in the poly group [0:8]
ROW_COLOR = 8
ROW_CONIC = 11
ROW_MY = 14
# gradient columns in the backward output [I, 128] (ROW-major, unlike the
# feature-major input: the consumer gathers per-intersection rows by an
# arbitrary permutation, and row gathers from contiguous rows are ~30x
# cheaper than lane-strided gathers from a feature-major layout; the
# kernel transposes each [128, CH] chunk in-register before the write
# DMA). The minor dim is padded 11 -> 128 because Mosaic HBM windows must
# be 128-lane sized/aligned. The output dtype is BF16 with an exact
# hi/lo lane split (the same decomposition the kernels' MXU scans use):
# lane f holds the bf16 high half of gradient feature f, lane f+16 the
# bf16 low half (hi + lo reconstructs f32 to ~2^-17 relative — far
# inside the kernels' own ~1e-4 cancellation floor). 256 B/row instead
# of the f32 layout's 512 halves every downstream gather/reduce byte AND
# keeps the buffer below int32-byte addressing until ~8.4M intersections
# (the f32 layout crossed 2^31 bytes at 4.19M — the 3M-Gaussian bench
# regime needs ~7M).
# lanes 0-10 (hi) / 16-26 (lo):
# 0 v_mx, 1 v_my, 2 v_a, 3 v_b, 4 v_c, 5 v_opac, 6-8 v_rgb, 9 v_absx,
# 10 v_absy; 11-15, 27-127 pad
NUM_GRAD_FEATURES = 16
NUM_GRAD_LANES = 128
GRAD_DTYPE = jnp.bfloat16
GRAD_LO_SHIFT = 16  # lane offset of the bf16 low halves


def grad_rows_to_f32(rows: jnp.ndarray, n: int = 12) -> jnp.ndarray:
    """Reconstruct f32 gradient columns [*, n] from bf16 hi/lo rows
    [*, 128] (lanes f + f+GRAD_LO_SHIFT). Also accepts an f32 row matrix
    whose lanes follow the same split (e.g. segment-reduced sums of bf16
    rows accumulated in f32)."""
    return rows[..., :n].astype(jnp.float32) + rows[
        ..., GRAD_LO_SHIFT : GRAD_LO_SHIFT + n
    ].astype(jnp.float32)


def _shift_lanes(x: jnp.ndarray, shift: int, fill: float) -> jnp.ndarray:
    """Shift right along the lane axis (axis 1), filling with ``fill``."""
    pad = jnp.full(x.shape[:1] + (shift,), fill, x.dtype)
    return jnp.concatenate([pad, x[:, :-shift]], axis=1)


def _shift_lanes_left(x: jnp.ndarray, shift: int, fill: float) -> jnp.ndarray:
    pad = jnp.full(x.shape[:1] + (shift,), fill, x.dtype)
    return jnp.concatenate([x[:, shift:], pad], axis=1)


def _cumprod_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along lanes (log-step)."""
    c = x.shape[1]
    shift = 1
    while shift < c:
        x = x * _shift_lanes(x, shift, 1.0)
        shift *= 2
    return x


def _cumprod_lanes_rev(x: jnp.ndarray) -> jnp.ndarray:
    """out[:, i] = prod_{j >= i} x[:, j]."""
    c = x.shape[1]
    shift = 1
    while shift < c:
        x = x * _shift_lanes_left(x, shift, 1.0)
        shift *= 2
    return x


def _cumsum_lanes_rev(x: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[1]
    shift = 1
    while shift < c:
        x = x + _shift_lanes_left(x, shift, 0.0)
        shift *= 2
    return x


def _cummax_lanes(x: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[1]
    shift = 1
    while shift < c:
        x = jnp.maximum(x, _shift_lanes(x, shift, -jnp.inf))
        shift *= 2
    return x


def _tri(ch: int, *, lower: bool, strict: bool) -> jnp.ndarray:
    """[CH, CH] triangular 0/1 matrix (bf16: 0/1 are exact). Lane scans as
    matmuls: the MXU pads the contraction dim to 128 anyway, so `x @ tri`
    costs the same as the kernel's K=3 matmuls while a 7-step Hillis-Steele
    scan costs ~14 VPU passes over [P, CH] (measured 4.3 ms of the 12.4 ms
    backward)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    if lower:
        m = (r > c) if strict else (r >= c)
    else:
        m = (r < c) if strict else (r <= c)
    return m.astype(jnp.bfloat16)


def _scan_mm(x: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Prefix/suffix sum along lanes via two bf16 MXU matmuls.

    The scans are ~90% of the kernels' MAC work; f32 matmuls run at a
    fraction of the MXU's bf16 rate, so split the data into bf16 hi+lo
    halves (x = hi + lo exactly to ~2^-17 relative) and accumulate both
    products in f32 — the tri matrix is exactly representable (0/1), so
    the result carries ~16-bit-mantissa precision at ~2 bf16 passes
    instead of the f32 matmul's slower multi-pass decomposition."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    # precision must be DEFAULT: Mosaic rejects bf16 operands with an
    # fp32 contract_precision ("Bad lhs type"); accumulation is still f32
    # via preferred_element_type
    return jax.lax.dot_general(
        hi, tri, dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        lo, tri, dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )


def _row(group: jnp.ndarray, idx: int) -> jnp.ndarray:
    """Row ``idx`` of an [8, CH] value as [1, CH] via iota-masked sum."""
    rowid = jax.lax.broadcasted_iota(jnp.int32, group.shape, 0)
    return jnp.sum(
        jnp.where(rowid == idx, group, 0.0), axis=0, keepdims=True
    )


def _rows3(group: jnp.ndarray, first: int) -> jnp.ndarray:
    """Rows [first, first+3) of an [8, CH] value as [3, CH]."""
    return jnp.concatenate(
        [_row(group, first), _row(group, first + 1), _row(group, first + 2)],
        axis=0,
    )


def _chunk_alpha(buf, basis, start, end, base):
    """Shared alpha evaluation for one chunk.

    buf: [16, CH] feature window; basis: [P, 8]; [start, end): the tile's
    intersection range; base: global index of lane 0. Feature row 6 is
    nlo = -log(opacity) and basis column 6 is 1, so the sigma matmul
    yields s2 = sigma + nlo directly and
    ``alpha_raw = opac * exp(-max(sigma, 0)) = exp(-max(s2, nlo))`` with
    no separate opacity multiply. Returns (alpha [P,CH] zeroed when
    ineligible, elig, alpha_raw [P,CH] unclamped, nlo [1,CH], gpos [1,CH]).
    """
    poly = buf[0:8, :]  # [8, CH] (rows 6,7 carry nlo/mx; basis col 7 = 0)
    s2 = jax.lax.dot_general(
        basis, poly, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [P, CH] = sigma + nlo
    nlo = _row(poly, ROW_OPACITY)  # [1, CH] = -log(opacity)
    alpha_raw = jnp.exp(-jnp.maximum(s2, nlo))
    alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s2.shape[1]), 1)
    gpos = base + lane  # [1, CH] global intersection index
    in_range = (gpos >= start) & (gpos < end)
    elig = (s2 >= nlo - SIGMA_EPS) & (alpha >= ALPHA_THRESH) & in_range
    alpha = jnp.where(elig, alpha, 0.0)
    return alpha, elig, alpha_raw, nlo, gpos


def _fwd_kernel(
    offsets_ref,  # scalar prefetch [T+1]
    feats_ref,  # HBM [16, I_pad]
    basis_ref,  # VMEM [P, 8]
    rgb_ref,  # out [1, P, 3]
    t_ref,  # out [1, P, 1]
    last_ref,  # out [1, P, 1] int32
    buf_ref,  # scratch VMEM [2, 16, CHUNK] (double-buffered)
    done_ref,  # scratch VMEM [P, 1] float32 (0/1)
    sem,  # DMA semaphores [2]
):
    t = pl.program_id(0)
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    astart = (start // FWD_CHUNK) * FWD_CHUNK

    rgb_ref[...] = jnp.zeros_like(rgb_ref)
    t_ref[...] = jnp.ones_like(t_ref)
    last_ref[...] = jnp.full_like(last_ref, -1)
    done_ref[...] = jnp.zeros_like(done_ref)

    num_chunks = pl.cdiv(end - astart, FWD_CHUNK)

    def dma(k):
        slot = jax.lax.rem(k, 2)
        base = astart + k * FWD_CHUNK
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(pl.multiple_of(base, FWD_CHUNK), FWD_CHUNK)],
            buf_ref.at[slot],
            sem.at[slot],
        )

    u_strict = _tri(FWD_CHUNK, lower=False, strict=True)

    @pl.when(num_chunks > 0)
    def _():
        dma(jnp.int32(0)).start()

    def cond(state):
        k, all_done = state
        return (k < num_chunks) & jnp.logical_not(all_done)

    def body(state):
        k, _ = state
        base = astart + k * FWD_CHUNK

        @pl.when(k + 1 < num_chunks)
        def _():
            dma(k + 1).start()

        dma(k).wait()
        buf = buf_ref[jax.lax.rem(k, 2)]

        alpha, elig, _, _, gpos = _chunk_alpha(
            buf, basis_ref[...], start, end, base
        )
        om = 1.0 - alpha  # [P, CH]
        # exclusive prefix product of om, in log space on the MXU
        # (alpha <= ALPHA_CLAMP keeps om >= 1e-3, so log is well-behaved;
        # ineligible lanes have alpha=0 -> log(om)=0)
        l_om = jnp.log(om)
        cum_excl = jnp.exp(_scan_mm(l_om, u_strict))
        t_in = t_ref[0]  # [P, 1]
        t_g = t_in * cum_excl
        stop = elig & (t_g * om < T_EPS)
        stop_f = stop.astype(jnp.float32)
        done_in = done_ref[...]  # [P, 1]
        # "some earlier lane fired the stop" == "this lane's own
        # t_after < eps": t_g is non-increasing along lanes (om <= 1,
        # ineligible lanes have om = 1), so once an eligible lane drives
        # t_after below T_EPS every later eligible lane fails its own
        # t_after test too — the per-lane test subsumes the prefix-OR
        # scan (same truth table on identical floats => bit-identical
        # output, at half the forward's MXU work)
        comp = elig & jnp.logical_not(stop) & (done_in <= 0.0)
        w = jnp.where(comp, alpha * t_g, 0.0)  # [P, CH]

        col = _rows3(buf[8:16, :], ROW_COLOR - 8)  # [3, CH] rows 8-10
        contrib = jax.lax.dot_general(
            w, col, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, 3]
        rgb_ref[0] = rgb_ref[0] + contrib

        # T update: product of om over composited lanes only
        # (lane reductions here measured FASTER than MXU-matmul
        # replacements: the sum/any/argmax-as-matmul variant cost
        # +2.3 ms/step at N=100k, 800x800)
        t_ref[0] = t_in * jnp.exp(
            jnp.sum(jnp.where(comp, l_om, 0.0), axis=1, keepdims=True)
        )
        done_new = jnp.maximum(
            done_in, jnp.max(stop_f, axis=1, keepdims=True)
        )
        done_ref[...] = done_new

        # last contributor; relative positions fit f32 exactly
        rel = (gpos - start).astype(jnp.float32)  # [1, CH]
        last_c = jnp.max(
            jnp.where(comp, jnp.broadcast_to(rel, comp.shape), -1.0),
            axis=1,
            keepdims=True,
        )  # [P, 1]
        last_new = jnp.maximum(
            last_ref[0].astype(jnp.float32),
            jnp.where(
                last_c >= 0.0, last_c + start.astype(jnp.float32), -1.0
            ),
        )
        last_ref[0] = last_new.astype(jnp.int32)

        return k + 1, jnp.min(done_new) > 0.0

    k_exit, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), False))

    # drain the in-flight prefetch if the early exit fired mid-stream
    # (otherwise the next grid program inherits a signaled semaphore)
    @pl.when((k_exit > 0) & (k_exit < num_chunks))
    def _():
        dma(k_exit).wait()


def tiled_forward(
    feats: jnp.ndarray,  # [16, I_pad] (I_pad multiple of CHUNK, + CHUNK pad)
    tile_offsets: jnp.ndarray,  # [T+1] int32
    basis: jnp.ndarray,  # [P, 8]
    num_tiles: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (rgb [T,P,3], final_T [T,P], last_idx [T,P])."""
    p = basis.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 3), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FEATURES, FWD_CHUNK), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    rgb, tfin, last = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, p, 1), jnp.int32),
        ],
        interpret=interpret,
    )(tile_offsets, feats, basis)
    return rgb, tfin[..., 0], last[..., 0]


def _bwd_kernel(
    offsets_ref,  # scalar prefetch [T+1]
    feats_ref,  # HBM [16, I_pad]
    basis_ref,  # VMEM [P, 8]
    gimg_ref,  # VMEM block [1, 3, P]
    gt_ref,  # VMEM block [1, P, 1]
    tfin_ref,  # VMEM block [1, P, 1]
    last_ref,  # VMEM block [1, P, 1] int32
    dfeats_ref,  # HBM out [I_pad, 128] row-major
    tstate_ref,  # scratch VMEM [P, 1]
    sstate_ref,  # scratch VMEM [P, 1]
    buf_ref,  # scratch VMEM [2, 16, CHUNK] (double-buffered)
    dbuf_ref,  # scratch VMEM [2, 16, CHUNK] (double-buffered writes)
    rbuf_ref,  # scratch VMEM [16, CHUNK] (boundary-window merge reads)
    sem_in,  # DMA semaphores [2]
    sem_out,  # DMA semaphores [2]
    sem_rd,
):
    t = pl.program_id(0)
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    astart = (start // BWD_CHUNK) * BWD_CHUNK

    tstate_ref[...] = tfin_ref[0]
    # suffix term: g_T * T_fin (the background blend happens in XLA and its
    # gradient arrives through gt_ref)
    sstate_ref[...] = gt_ref[0] * tfin_ref[0]

    gimg = gimg_ref[0]  # [3, P]
    last = last_ref[0]  # [P, 1] int32

    # nothing after the tile's last contributor receives gradient: bound
    # the walk by the per-tile horizon (mirrors the forward early exit)
    max_last = jnp.max(last)  # -1 if nothing composited
    n_eff = jnp.maximum(
        jnp.minimum(max_last + 1, end) - astart, 0
    )
    num_chunks = pl.cdiv(n_eff, BWD_CHUNK)
    l_incl = _tri(BWD_CHUNK, lower=True, strict=False)
    l_strict = _tri(BWD_CHUNK, lower=True, strict=True)

    def feats_dma(k):
        slot = jax.lax.rem(k, 2)
        base = astart + k * BWD_CHUNK
        return pltpu.make_async_copy(
            feats_ref.at[:, pl.ds(pl.multiple_of(base, BWD_CHUNK), BWD_CHUNK)],
            buf_ref.at[slot],
            sem_in.at[slot],
        )

    def out_dma(k, slot):
        base = astart + k * BWD_CHUNK
        return pltpu.make_async_copy(
            dbuf_ref.at[slot],
            dfeats_ref.at[pl.ds(pl.multiple_of(base, BWD_CHUNK), BWD_CHUNK), :],
            sem_out.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        feats_dma(num_chunks - 1).start()

    def body(kk, _):
        k = num_chunks - 1 - kk
        base = astart + k * BWD_CHUNK
        slot = jax.lax.rem(k, 2)
        # only the tile's boundary windows share lanes with neighboring
        # tiles and need a read-merge; interior windows are written whole
        boundary = (base < start) | (base + BWD_CHUNK > end)

        @pl.when(boundary)
        def _():
            pltpu.make_async_copy(
                dfeats_ref.at[
                    pl.ds(pl.multiple_of(base, BWD_CHUNK), BWD_CHUNK), :
                ],
                rbuf_ref,
                sem_rd,
            ).start()

        @pl.when(k > 0)
        def _():
            feats_dma(k - 1).start()

        feats_dma(k).wait()
        buf = buf_ref[jax.lax.rem(k, 2)]

        alpha, elig, araw, nlo, gpos = _chunk_alpha(
            buf, basis_ref[...], start, end, base
        )
        comp = elig & (gpos <= last)  # [P, CH]
        om = jnp.where(comp, 1.0 - alpha, 1.0)
        inv = 1.0 / om
        # suffix product of 1/om: log-space suffix sum on the MXU
        l_om = jnp.log(om)
        rc = jnp.exp(-_scan_mm(l_om, l_incl))  # [P, CH]
        t_g = tstate_ref[...] * rc
        w = jnp.where(comp, alpha * t_g, 0.0)

        grp1 = buf[8:16, :]
        col = _rows3(grp1, ROW_COLOR - 8)  # [3, CH] rows 8-10
        dotc = jax.lax.dot_general(
            gimg, col, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, CH]
        dw = dotc * w
        rs = _scan_mm(dw, l_strict)  # sum over j > g within chunk
        s_g = sstate_ref[...] + rs
        v_alpha = jnp.where(comp, dotc * t_g - s_g * inv, 0.0)
        v_sigma = -araw * v_alpha  # [P, CH]  (araw = G * opac)

        # MXU reductions over pixels -> moment rows [8, CH]
        moments = jax.lax.dot_general(
            basis_ref[...], v_sigma, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [8, CH]
        v_color = jax.lax.dot_general(
            gimg, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3, CH]
        # v_opac = sum_p G*v_alpha = (1/opac) * sum_p araw*v_alpha; the
        # moments matmul already holds sum_p v_sigma in row 5 (basis col 5
        # is the ones column), so the whole [P,CH] reduction is free:
        # v_opac = -m5 * exp(nlo). Dead lanes have v_sigma = 0 -> m5 = 0,
        # so the exp(nlo) <= 1e12 factor never amplifies garbage.
        v_opac = -_row(moments, 5) * jnp.exp(nlo)  # [1, CH]

        a = _row(grp1, ROW_CONIC - 8)
        b = _row(grp1, ROW_CONIC - 8 + 1)
        cc = _row(grp1, ROW_CONIC - 8 + 2)
        mx = _row(buf[0:8, :], ROW_MX)
        my = _row(grp1, ROW_MY - 8)
        px = basis_ref[:, 3:4]  # [P, 1] whole-column reads of the basis
        py = basis_ref[:, 4:5]
        dx = mx - px  # [P, CH]
        dy = my - py
        gx = v_sigma * (a * dx + b * dy)
        gy = v_sigma * (b * dx + cc * dy)
        v_mx = jnp.sum(gx, axis=0, keepdims=True)  # [1, CH]
        v_my = jnp.sum(gy, axis=0, keepdims=True)
        v_absx = jnp.sum(jnp.abs(gx), axis=0, keepdims=True)
        v_absy = jnp.sum(jnp.abs(gy), axis=0, keepdims=True)

        m0 = _row(moments, 0)
        m1 = _row(moments, 1)
        m2 = _row(moments, 2)
        m3 = _row(moments, 3)
        m4 = _row(moments, 4)
        m5 = _row(moments, 5)
        v_a = 0.5 * m0 - mx * m3 + 0.5 * mx * mx * m5
        v_c = 0.5 * m1 - my * m4 + 0.5 * my * my * m5
        v_b = m2 - my * m3 - mx * m4 + mx * my * m5

        pad = jnp.zeros(
            (NUM_GRAD_LANES - 11, v_mx.shape[1]), jnp.float32
        )
        new_out = jnp.concatenate(
            [
                v_mx, v_my, v_a, v_b, v_c, v_opac,
                _row(v_color, 0), _row(v_color, 1), _row(v_color, 2),
                v_absx, v_absy, pad,
            ],
            axis=0,
        )  # [128, CH]
        # transpose to row-major [CH, 128] before the write so the output
        # array's per-intersection rows are contiguous (the consumer's
        # permutation gather reads rows, not lanes), then split each f32
        # into bf16 hi (lanes 0-10) + lo (lanes 16-26): x = hi + lo holds
        # to ~2^-17 relative, and the lanes are disjoint so the add is
        # exact
        new_out_f = jnp.swapaxes(new_out, 0, 1)  # [CH, 128] f32
        hi = new_out_f.astype(GRAD_DTYPE)
        lo = (new_out_f - hi.astype(jnp.float32)).astype(GRAD_DTYPE)
        new_out_t = hi + _shift_lanes(lo, GRAD_LO_SHIFT, 0.0)

        # the slot's previous write (chunk k+2) must land before reuse
        @pl.when(kk >= 2)
        def _():
            out_dma(k + 2, slot).wait()

        @pl.when(boundary)
        def _():
            pltpu.make_async_copy(
                dfeats_ref.at[
                    pl.ds(pl.multiple_of(base, BWD_CHUNK), BWD_CHUNK), :
                ],
                rbuf_ref,
                sem_rd,
            ).wait()
            row_pos = base + jax.lax.broadcasted_iota(
                jnp.int32, (BWD_CHUNK, 1), 0
            )
            in_range = (row_pos >= start) & (row_pos < end)  # [CH, 1]
            dbuf_ref[slot] = jnp.where(in_range, new_out_t, rbuf_ref[...])

        @pl.when(jnp.logical_not(boundary))
        def _():
            dbuf_ref[slot] = new_out_t

        out_dma(k, slot).start()

        tstate_ref[...] = tstate_ref[...] * rc[:, 0:1]
        sstate_ref[...] = sstate_ref[...] + jnp.sum(
            dw, axis=1, keepdims=True
        )
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)

    # drain in-flight writes before the next grid program may read the
    # shared boundary window (grid runs sequentially in tile order); the
    # unwaited writes are those of chunks 0 and 1 (slots 0 and 1)
    @pl.when(num_chunks >= 1)
    def _():
        out_dma(0, 0).wait()

    @pl.when(num_chunks >= 2)
    def _():
        out_dma(1, 1).wait()


def tiled_backward(
    feats: jnp.ndarray,  # [16, I_pad]
    tile_offsets: jnp.ndarray,  # [T+1]
    basis: jnp.ndarray,  # [P, 8]
    gimg_tiles: jnp.ndarray,  # [T, 3, P]
    gt_tiles: jnp.ndarray,  # [T, P]
    tfin_tiles: jnp.ndarray,  # [T, P]
    last_tiles: jnp.ndarray,  # [T, P] int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns per-intersection gradient rows [I_pad, 128] ROW-major in
    the bf16 hi/lo lane split (``GRAD_DTYPE`` docs above; decode with
    :func:`grad_rows_to_f32`). Rows outside every tile's range keep
    zeros (merge-writes + a zero-initialized aliased output)."""
    num_tiles = gimg_tiles.shape[0]
    p = basis.shape[0]
    i_pad = feats.shape[1]
    zeros_init = jnp.zeros((i_pad, NUM_GRAD_LANES), GRAD_DTYPE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.HBM),  # zeros init, aliased
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((2, NUM_FEATURES, BWD_CHUNK), jnp.float32),
            pltpu.VMEM((2, BWD_CHUNK, NUM_GRAD_LANES), GRAD_DTYPE),
            pltpu.VMEM((BWD_CHUNK, NUM_GRAD_LANES), GRAD_DTYPE),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def kernel(offsets, feats_r, basis_r, gimg_r, gt_r, tfin_r, last_r,
               zeros_r, dfeats_r, *rest):
        del zeros_r
        _bwd_kernel(
            offsets, feats_r, basis_r, gimg_r, gt_r, tfin_r, last_r,
            dfeats_r, *rest,
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((i_pad, NUM_GRAD_LANES), GRAD_DTYPE),
        ],
        # alias the zeros input to the output so untouched lanes read as 0
        input_output_aliases={7: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_offsets,
        feats,
        basis,
        gimg_tiles,
        gt_tiles[..., None],
        tfin_tiles[..., None],
        last_tiles[..., None],
        zeros_init,
    )[0]
