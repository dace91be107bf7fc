"""Pallas TPU kernels: per-tile front-to-back compositing, forward + backward.

Replaces the CUDA rasterize kernels of the reference's external dependency
(behavioral contract at ``/root/reference/model/gaussian.py:353-374``; the
compositing/backward math matches ``ops/rasterize_ref.py``, the oracle these
kernels are tested against).

Design notes (TPU, not CUDA):
- the grid is one program per image tile; each program walks its CSR slice
  of the depth-ordered intersection list in fixed-size chunks DMA'd from
  HBM (variable per-tile work is natural in Pallas, impossible in plain
  XLA without massive padding);
- sigma over the tile's pixels is an [c, 8] x [8, P] MXU matmul against a
  tile-local polynomial basis; color accumulation and the backward
  reductions are MXU matmuls too;
- in-chunk front-to-back ordering uses log-step (Hillis-Steele) cumulative
  products — no atomics, no per-pixel serial loop;
- early exit: a chunk loop terminates once every pixel in the tile has
  saturated (transmittance below 1e-4), mirroring the per-pixel early stop;
- the backward walks chunks in reverse, recovering transmittance by
  division (alpha is clamped at 0.999, so 1-alpha >= 1e-3) exactly like the
  classic hand-derived 3DGS backward, and emits per-intersection gradients
  to non-overlapping rows (scatter-add back to Gaussians happens in XLA).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rasterize_ref import ALPHA_CLAMP, ALPHA_THRESH, T_EPS

CHUNK = 128


def _cumprod0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (log-step)."""
    c = x.shape[0]
    shift = 1
    while shift < c:
        ones = jnp.ones((shift,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([ones, x[:-shift]], axis=0)
        shift *= 2
    return x


def _cumprod0_rev(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive reverse cumulative product along axis 0: out[i] = prod_{j>=i}."""
    c = x.shape[0]
    shift = 1
    while shift < c:
        ones = jnp.ones((shift,) + x.shape[1:], x.dtype)
        x = x * jnp.concatenate([x[shift:], ones], axis=0)
        shift *= 2
    return x


def _cumsum0_rev(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive reverse cumulative sum along axis 0."""
    c = x.shape[0]
    shift = 1
    while shift < c:
        zeros = jnp.zeros((shift,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([x[shift:], zeros], axis=0)
        shift *= 2
    return x


def _prod0(x: jnp.ndarray) -> jnp.ndarray:
    """Product along axis 0, keepdims — Mosaic has no reduce_prod, so use
    the log-step cumulative product and take its last row."""
    return _cumprod0(x)[-1:]


def _cummax0(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative maximum along axis 0 (for the stop prefix)."""
    c = x.shape[0]
    shift = 1
    while shift < c:
        neg = jnp.full((shift,) + x.shape[1:], -jnp.inf, x.dtype)
        x = jnp.maximum(x, jnp.concatenate([neg, x[:-shift]], axis=0))
        shift *= 2
    return x


def _chunk_alpha(buf, basis, rem):
    """Shared per-chunk alpha evaluation. buf [c,16], basis [8,P], rem = valid
    rows. Returns (alpha, elig, G, opac) with alpha zeroed when ineligible."""
    c = buf.shape[0]
    g6 = buf[:, 0:8]  # sigma polynomial coefficients (6 used)
    sigma = jax.lax.dot_general(
        g6,
        basis,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [c, P]
    G = jnp.exp(-sigma)
    opac = buf[:, 6:7]  # [c, 1]
    alpha_raw = opac * G
    alpha = jnp.minimum(alpha_raw, ALPHA_CLAMP)
    row = jax.lax.broadcasted_iota(jnp.int32, sigma.shape, 0)
    elig = (sigma >= 0.0) & (alpha >= ALPHA_THRESH) & (row < rem)
    alpha = jnp.where(elig, alpha, 0.0)
    return alpha, elig, G, opac


def _fwd_kernel(
    offsets_ref,  # scalar prefetch [T+1]
    feats_ref,  # HBM [I_pad, 16]
    basis_ref,  # VMEM [8, P]
    rgb_ref,  # out [1, 3, P]
    t_ref,  # out [1, 1, P]
    last_ref,  # out [1, 1, P] int32
    buf_ref,  # scratch VMEM [CHUNK, 16]
    done_ref,  # scratch VMEM [1, P] float32 (0/1)
    sem,  # DMA semaphore
):
    t = pl.program_id(0)
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    n = end - start
    p = basis_ref.shape[1]

    rgb_ref[...] = jnp.zeros_like(rgb_ref)
    t_ref[...] = jnp.ones_like(t_ref)
    last_ref[...] = jnp.full_like(last_ref, -1)
    done_ref[...] = jnp.zeros_like(done_ref)

    num_chunks = pl.cdiv(n, CHUNK)

    def cond(state):
        k, all_done = state
        return (k < num_chunks) & jnp.logical_not(all_done)

    def body(state):
        k, _ = state
        cp = pltpu.make_async_copy(
            feats_ref.at[pl.ds(start + k * CHUNK, CHUNK), :], buf_ref, sem
        )
        cp.start()
        cp.wait()

        alpha, elig, _, _ = _chunk_alpha(
            buf_ref[...], basis_ref[...], n - k * CHUNK
        )
        om = 1.0 - alpha
        cum_incl = _cumprod0(om)
        cum_excl = jnp.concatenate(
            [jnp.ones((1, p), jnp.float32), cum_incl[:-1]], axis=0
        )
        t_in = t_ref[0]  # [1, P]
        t_g = t_in * cum_excl
        stop = elig & (t_g * om < T_EPS)
        stop_f = stop.astype(jnp.float32)
        done_in = done_ref[...]  # [1, P]
        done_incl = (_cummax0(stop_f) > 0.0) | (done_in > 0.0)
        comp = elig & jnp.logical_not(done_incl)
        w = jnp.where(comp, alpha * t_g, 0.0)

        col = buf_ref[:, 7:10]  # [c, 3]
        contrib = jax.lax.dot_general(
            col, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3, P]
        rgb_ref[0] = rgb_ref[0] + contrib

        t_ref[0] = t_in * _prod0(jnp.where(comp, om, 1.0))
        done_new = jnp.maximum(
            done_in, jnp.max(stop_f, axis=0, keepdims=True)
        )
        done_ref[...] = done_new

        pos = start + k * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, p), 0
        )
        last_c = jnp.max(
            jnp.where(comp, pos, -1), axis=0, keepdims=True
        )
        last_ref[0] = jnp.maximum(last_ref[0], last_c)

        return k + 1, jnp.min(done_new) > 0.0

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def tiled_forward(
    feats: jnp.ndarray,  # [I_pad, 16] (padded by >= CHUNK zero rows)
    tile_offsets: jnp.ndarray,  # [T+1] int32
    basis: jnp.ndarray,  # [8, P]
    num_tiles: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the forward kernel. Returns (rgb [T,3,P], final_T [T,P],
    last_idx [T,P])."""
    p = basis.shape[1]
    # TPU block shapes must have (8,128)-divisible or full trailing dims;
    # singleton middle dims keep per-tile blocks legal
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((CHUNK, 16), jnp.float32),
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    rgb, tfin, last = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 3, p), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.int32),
        ],
        interpret=interpret,
    )(tile_offsets, feats, basis)
    # squeeze the singleton block dim: [T, 1, P] -> [T, P]
    return rgb, tfin[:, 0], last[:, 0]


def _bwd_kernel(
    offsets_ref,  # scalar prefetch [T+1]
    feats_ref,  # HBM [I_pad, 16]
    basis_ref,  # VMEM [8, P]
    gimg_ref,  # VMEM block [1, 3, P]: dL/dimage for this tile
    gt_ref,  # VMEM block [1, 1, P]: dL/dfinal_T
    tfin_ref,  # VMEM block [1, 1, P]: forward final transmittance
    last_ref,  # VMEM block [1, 1, P] int32: forward last contributor
    dfeats_ref,  # HBM out [I_pad, 16]
    tstate_ref,  # scratch VMEM [1, P]
    sstate_ref,  # scratch VMEM [1, P]
    buf_ref,  # scratch VMEM [CHUNK, 16]
    dbuf_ref,  # scratch VMEM [CHUNK, 16]
    sem_in,
    sem_out,
):
    t = pl.program_id(0)
    start = offsets_ref[t]
    end = offsets_ref[t + 1]
    n = end - start
    p = basis_ref.shape[1]

    tstate_ref[...] = tfin_ref[0]
    # suffix term: (g . bg + g_T) * T_fin; the background blend happens in
    # XLA so its contribution arrives through gt_ref
    sstate_ref[...] = gt_ref[0] * tfin_ref[0]

    num_chunks = pl.cdiv(n, CHUNK)
    gimg = gimg_ref[0]  # [3, P]
    last = last_ref[0]  # [1, P]

    def body(kk, _):
        k = num_chunks - 1 - kk
        cp = pltpu.make_async_copy(
            feats_ref.at[pl.ds(start + k * CHUNK, CHUNK), :], buf_ref, sem_in
        )
        cp.start()
        cp.wait()
        buf = buf_ref[...]

        alpha, elig, G, opac = _chunk_alpha(buf, basis_ref[...], n - k * CHUNK)
        pos = start + k * CHUNK + jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, p), 0
        )
        comp = elig & (pos <= last)
        om = jnp.where(comp, 1.0 - alpha, 1.0)
        inv = 1.0 / om
        rc = _cumprod0_rev(inv)  # [c, P]
        t_g = tstate_ref[...] * rc
        w = jnp.where(comp, alpha * t_g, 0.0)

        col = buf[:, 7:10]  # [c, 3]
        dotc = jax.lax.dot_general(
            col, gimg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [c, P]
        dw = dotc * w
        rs = _cumsum0_rev(dw) - dw  # sum over j > g within chunk
        s_g = sstate_ref[...] + rs
        v_alpha = jnp.where(comp, dotc * t_g - s_g * inv, 0.0)
        v_sigma = -G * opac * v_alpha  # [c, P]

        # MXU reductions over pixels
        moments = jax.lax.dot_general(
            v_sigma, basis_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [c, 8]: sums of v_sigma * (px2, py2, pxpy, px, py, 1, 0, 0)
        v_color = jax.lax.dot_general(
            w, gimg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [c, 3]
        v_opac = jnp.sum(G * v_alpha, axis=1, keepdims=True)  # [c, 1]

        # screen-mean gradients and absgrad (per-pixel absolute values)
        a = buf[:, 10:11]
        b = buf[:, 11:12]
        cc = buf[:, 12:13]
        mx = buf[:, 13:14]
        my = buf[:, 14:15]
        px = basis_ref[3:4, :]  # [1, P]
        py = basis_ref[4:5, :]
        dx = mx - px  # [c, P]
        dy = my - py
        gx = v_sigma * (a * dx + b * dy)
        gy = v_sigma * (b * dx + cc * dy)
        v_mx = jnp.sum(gx, axis=1, keepdims=True)
        v_my = jnp.sum(gy, axis=1, keepdims=True)
        v_absx = jnp.sum(jnp.abs(gx), axis=1, keepdims=True)
        v_absy = jnp.sum(jnp.abs(gy), axis=1, keepdims=True)

        # conic gradients from the polynomial-coefficient moments
        m0 = moments[:, 0:1]
        m1 = moments[:, 1:2]
        m2 = moments[:, 2:3]
        m3 = moments[:, 3:4]
        m4 = moments[:, 4:5]
        m5 = moments[:, 5:6]
        v_a = 0.5 * m0 - mx * m3 + 0.5 * mx * mx * m5
        v_c = 0.5 * m1 - my * m4 + 0.5 * my * my * m5
        v_b = m2 - my * m3 - mx * m4 + mx * my * m5

        zeros = jnp.zeros_like(v_mx)
        dbuf_ref[...] = jnp.concatenate(
            [
                v_mx, v_my, v_a, v_b, v_c, v_opac,
                v_color[:, 0:1], v_color[:, 1:2], v_color[:, 2:3],
                v_absx, v_absy, zeros, zeros, zeros, zeros, zeros,
            ],
            axis=1,
        )
        cp_out = pltpu.make_async_copy(
            dbuf_ref,
            dfeats_ref.at[pl.ds(start + k * CHUNK, CHUNK), :],
            sem_out,
        )
        cp_out.start()
        cp_out.wait()

        tstate_ref[...] = tstate_ref[...] * rc[0:1]
        sstate_ref[...] = sstate_ref[...] + jnp.sum(dw, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)


def tiled_backward(
    feats: jnp.ndarray,  # [I_pad, 16]
    tile_offsets: jnp.ndarray,  # [T+1]
    basis: jnp.ndarray,  # [8, P]
    gimg_tiles: jnp.ndarray,  # [T, 3, P]
    gt_tiles: jnp.ndarray,  # [T, P]
    tfin_tiles: jnp.ndarray,  # [T, P]
    last_tiles: jnp.ndarray,  # [T, P] int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the backward kernel. Returns per-intersection gradient features
    [I_pad, 16]: (v_mx, v_my, v_a, v_b, v_c, v_opac, v_r, v_g, v_b_color,
    v_absx, v_absy, 0 x5). Rows past the last valid intersection hold
    garbage — the caller masks by intersection count."""
    num_tiles = gimg_tiles.shape[0]
    p = basis.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, p), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
            pl.BlockSpec((1, 1, p), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((1, p), jnp.float32),
            pltpu.VMEM((CHUNK, 16), jnp.float32),
            pltpu.VMEM((CHUNK, 16), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(feats.shape, jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_offsets,
        feats,
        basis,
        gimg_tiles,
        gt_tiles[:, None],
        tfin_tiles[:, None],
        last_tiles[:, None],
    )[0]
