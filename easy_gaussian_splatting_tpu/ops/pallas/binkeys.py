"""Pallas TPU kernel for binning key/flat construction + exact tile test.

Replaces the XLA [C, M] duplicate-grid computation in
``rasterize_tiled.bin_gaussians`` (window tiling, the exact
ellipse/tile test, sentinel keying, count reduction) — measured ~16 ms
at the 1M-Gaussian point for what is ~2 GB of streaming elementwise
work (~2-3 ms here).

Layout: the duplicate grid is processed J-MAJOR — cells on sublanes
(static per row), gaussians on lanes — so all per-Gaussian features
broadcast along rows and no lane-indexed arithmetic is needed. Inputs
arrive FEATURE-MAJOR [16, C_pad] (rows listed in ``FEAT_ROWS``); the
output block stacks, per 128-gaussian lane group:

  rows [0, n_keys)            packed sort keys  (tile<<rank_bits|rank)
  rows [n_keys, 2*n_keys)     flat duplicate ids (c*M + j, sentinel dead)
  row  2*n_keys               count_small = live cells with j < n_keys
  row  2*n_keys + 1           count_full  = live cells with j < M

Integer exactness: all tile/position arithmetic stays < 2^24 so f32 is
exact; jy = floor(j/w) for j < 16, w in [1, 16] is exact under IEEE
division; the packed key (up to 31 bits) is assembled in int32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rasterize_ref import ALPHA_THRESH  # noqa: F401 (spec reference)

FEAT_ROWS = (
    "mx", "my", "tx0", "ty0", "w", "h", "a", "b", "cc", "s_max",
    "rank", "livebase", "count_w", "orig", "pad1", "pad2",
)
NF = 16
GBLK = 512  # gaussians (lanes) per grid step


def _row(block, idx):
    rowid = jax.lax.broadcasted_iota(jnp.int32, block.shape, 0)
    return jnp.sum(jnp.where(rowid == idx, block, 0.0), axis=0,
                   keepdims=True)


def _kernel(
    feats_ref,  # VMEM block [NF, GBLK]
    out_ref,  # VMEM block [2*n_keys + 2, GBLK] i32
    *,
    n_keys: int,
    m: int,
    ts: int,
    tiles_x: int,
    num_tiles: int,
    rank_bits: int,
    sentinel_flat: int,
):
    f = feats_ref[...]
    mx = _row(f, 0)
    my = _row(f, 1)
    tx0 = _row(f, 2)
    ty0 = _row(f, 3)
    w = _row(f, 4)
    h = _row(f, 5)
    a = _row(f, 6)
    b = _row(f, 7)
    cc = _row(f, 8)
    s_max = _row(f, 9)
    rank = _row(f, 10).astype(jnp.int32)
    livebase = _row(f, 11) > 0.0
    count_w = _row(f, 12)
    # original gaussian id (f32-exact < 2^24): the flat id must address
    # the caller's arrays even for the gathered overflow population
    orig = _row(f, 13).astype(jnp.int32)

    a_safe = jnp.maximum(a, 1e-12)
    c_safe = jnp.maximum(cc, 1e-12)
    w_safe = jnp.maximum(w, 1.0)
    ts_f = float(ts)

    key_rows = []
    flat_rows = []
    cnt_small = jnp.zeros_like(mx)
    cnt_full = jnp.zeros_like(mx)
    for j in range(m):
        jf = float(j)
        jy = jnp.floor(jf / w_safe)  # exact: small-int IEEE division
        jx = jf - jy * w_safe
        # count-liveness is population-independent (count_w is zero for
        # invalid gaussians); livebase additionally gates the KEY rows
        # (population membership, e.g. ~in_ov for the A invocation)
        live_cnt = jf < count_w
        # exact ellipse/tile test in mean-relative tile coordinates
        # (mirrors rasterize_tiled.bin_gaussians)
        x0 = (tx0 + jx) * ts_f - mx
        y0 = (ty0 + jy) * ts_f - my
        x1 = x0 + ts_f
        y1 = y0 + ts_f

        def sig(dx, dy):
            return 0.5 * a * dx * dx + 0.5 * cc * dy * dy + b * dx * dy

        def edge_x(xe):
            return sig(xe, jnp.clip(-b * xe / c_safe, y0, y1))

        def edge_y(ye):
            return sig(jnp.clip(-b * ye / a_safe, x0, x1), ye)

        s_edge = jnp.minimum(
            jnp.minimum(edge_x(x0), edge_x(x1)),
            jnp.minimum(edge_y(y0), edge_y(y1)),
        )
        inside = (x0 <= 0.0) & (0.0 <= x1) & (y0 <= 0.0) & (0.0 <= y1)
        s_min = jnp.where(inside, 0.0, s_edge)
        live_cnt = live_cnt & (s_min <= s_max)
        live = live_cnt & livebase

        cnt_f = live_cnt.astype(jnp.float32)
        cnt_full = cnt_full + cnt_f
        if j < n_keys:
            cnt_small = cnt_small + cnt_f
            tile = ((ty0 + jy) * float(tiles_x) + tx0 + jx).astype(
                jnp.int32
            )
            key = jnp.where(live, tile, num_tiles)
            # rank_bits == 0 => caller sorts rank as a second key (the
            # >2M-Gaussian regime where (tile, rank) exceeds 31 bits)
            packed = (
                key * (1 << rank_bits) + rank if rank_bits else key
            )
            flat = jnp.where(live, orig * m + j, sentinel_flat)
            key_rows.append(packed)
            flat_rows.append(flat)

    out_ref[...] = jnp.concatenate(
        key_rows
        + flat_rows
        + [cnt_small.astype(jnp.int32), cnt_full.astype(jnp.int32)],
        axis=0,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_keys", "m", "ts", "tiles_x", "num_tiles", "rank_bits",
        "sentinel_flat", "interpret",
    ),
)
def binkeys(
    feats: jnp.ndarray,  # [NF, C_pad] f32, rows per FEAT_ROWS
    *,
    n_keys: int,
    m: int,
    ts: int,
    tiles_x: int,
    num_tiles: int,
    rank_bits: int,
    sentinel_flat: int,
    interpret: bool = False,
):
    """Returns (packed [n_keys, C_pad], flats [n_keys, C_pad],
    count_small [C_pad], count_full [C_pad])."""
    c_pad = feats.shape[1]
    if c_pad % GBLK:
        raise ValueError(f"C_pad {c_pad} must be a multiple of {GBLK}")
    n_out = 2 * n_keys + 2
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            n_keys=n_keys, m=m, ts=ts, tiles_x=tiles_x,
            num_tiles=num_tiles, rank_bits=rank_bits,
            sentinel_flat=sentinel_flat,
        ),
        grid=(c_pad // GBLK,),
        in_specs=[pl.BlockSpec((NF, GBLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((n_out, GBLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n_out, c_pad), jnp.int32),
        interpret=interpret,
    )(feats)
    return (
        out[:n_keys],
        out[n_keys : 2 * n_keys],
        out[2 * n_keys],
        out[2 * n_keys + 1],
    )
