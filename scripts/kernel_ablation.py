"""Ablation timing of the backward Pallas kernel: which stage dominates?

Builds variants of the backward kernel with compute stages stubbed out
(results are WRONG on purpose) and times each on the chip, so kernel
optimization effort goes to the expensive stage.

Usage: python scripts/kernel_ablation.py [N] [H] [W]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.ops.projection import (
    CameraIntrinsics,
    project_gaussians,
)
from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
    _prepare,
    image_geometry,
    image_to_tiles,
    tile_pixel_basis,
)
from easy_gaussian_splatting_tpu.ops.pallas import tile_raster as tr
from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import (
    CHUNK,
    NUM_FEATURES,
    NUM_GRAD_FEATURES,
    ROW_COLOR,
    ROW_CONIC,
    ROW_MX,
    ROW_MY,
    _chunk_alpha,
    _cumprod_lanes_rev,
    _cumsum_lanes_rev,
    _row,
    _rows3,
    tiled_forward,
)


def make_bwd_kernel(*, scans=True, geomgrad=True, matmuls=True):
    def kernel(offsets_ref, feats_ref, basis_ref, gimg_ref, gt_ref,
               tfin_ref, last_ref, dfeats_ref, tstate_ref, sstate_ref,
               buf_ref, dbuf_ref, rbuf_ref, sem_in, sem_out, sem_rd):
        t = pl.program_id(0)
        start = offsets_ref[t]
        end = offsets_ref[t + 1]
        astart = (start // CHUNK) * CHUNK

        tstate_ref[...] = tfin_ref[0]
        sstate_ref[...] = gt_ref[0] * tfin_ref[0]
        gimg = gimg_ref[0]
        last = last_ref[0]
        max_last = jnp.max(last)
        n_eff = jnp.maximum(jnp.minimum(max_last + 1, end) - astart, 0)
        num_chunks = pl.cdiv(n_eff, CHUNK)

        def feats_dma(k):
            slot = jax.lax.rem(k, 2)
            base = astart + k * CHUNK
            return pltpu.make_async_copy(
                feats_ref.at[:, pl.ds(pl.multiple_of(base, CHUNK), CHUNK)],
                buf_ref.at[slot], sem_in.at[slot],
            )

        def out_dma(k, slot):
            base = astart + k * CHUNK
            return pltpu.make_async_copy(
                dbuf_ref.at[slot],
                dfeats_ref.at[:, pl.ds(pl.multiple_of(base, CHUNK), CHUNK)],
                sem_out.at[slot],
            )

        @pl.when(num_chunks > 0)
        def _():
            feats_dma(num_chunks - 1).start()

        def body(kk, _):
            k = num_chunks - 1 - kk
            base = astart + k * CHUNK
            slot = jax.lax.rem(k, 2)
            boundary = (base < start) | (base + CHUNK > end)

            @pl.when(boundary)
            def _():
                pltpu.make_async_copy(
                    dfeats_ref.at[
                        :, pl.ds(pl.multiple_of(base, CHUNK), CHUNK)
                    ],
                    rbuf_ref, sem_rd,
                ).start()

            @pl.when(k > 0)
            def _():
                feats_dma(k - 1).start()

            feats_dma(k).wait()
            buf = buf_ref[jax.lax.rem(k, 2)]

            alpha, elig, araw, nlo, gpos = _chunk_alpha(
                buf, basis_ref[...], start, end, base
            )
            comp = elig & (gpos <= last)
            om = jnp.where(comp, 1.0 - alpha, 1.0)
            inv = 1.0 / om
            if scans:
                rc = _cumprod_lanes_rev(inv)
            else:
                rc = inv
            t_g = tstate_ref[...] * rc
            w = jnp.where(comp, alpha * t_g, 0.0)

            grp1 = buf[8:16, :]
            col = _rows3(grp1, ROW_COLOR - 8)
            if matmuls:
                dotc = jax.lax.dot_general(
                    gimg, col, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                dotc = w + 1.0
            dw = dotc * w
            if scans:
                rs = _cumsum_lanes_rev(dw) - dw
            else:
                rs = dw
            s_g = sstate_ref[...] + rs
            v_alpha = jnp.where(comp, dotc * t_g - s_g * inv, 0.0)
            v_sigma = -araw * v_alpha  # araw = G * opac

            if matmuls:
                moments = jax.lax.dot_general(
                    basis_ref[...], v_sigma, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                v_color = jax.lax.dot_general(
                    gimg, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                moments = jnp.sum(v_sigma, axis=0, keepdims=True) + jnp.zeros(
                    (8, v_sigma.shape[1]), jnp.float32
                )
                v_color = jnp.sum(w, axis=0, keepdims=True) + jnp.zeros(
                    (3, w.shape[1]), jnp.float32
                )
            v_opac = -jnp.sum(
                v_sigma, axis=0, keepdims=True
            ) * jnp.exp(nlo)

            grp2 = buf[16:24, :]
            mx = _row(grp2, ROW_MX - 16)
            my = _row(grp2, ROW_MY - 16)
            if geomgrad:
                a = _row(grp1, ROW_CONIC - 8)
                b = _row(grp1, ROW_CONIC - 8 + 1)
                cc = _row(grp1, ROW_CONIC - 8 + 2)
                px = basis_ref[:, 3:4]
                py = basis_ref[:, 4:5]
                dx = mx - px
                dy = my - py
                gx = v_sigma * (a * dx + b * dy)
                gy = v_sigma * (b * dx + cc * dy)
                v_mx = jnp.sum(gx, axis=0, keepdims=True)
                v_my = jnp.sum(gy, axis=0, keepdims=True)
                v_absx = jnp.sum(jnp.abs(gx), axis=0, keepdims=True)
                v_absy = jnp.sum(jnp.abs(gy), axis=0, keepdims=True)
            else:
                v_mx = jnp.sum(v_sigma, axis=0, keepdims=True)
                v_my = v_mx
                v_absx = v_mx
                v_absy = v_mx

            m0 = _row(moments, 0)
            m1 = _row(moments, 1)
            m2 = _row(moments, 2)
            m3 = _row(moments, 3)
            m4 = _row(moments, 4)
            m5 = _row(moments, 5)
            v_a = 0.5 * m0 - mx * m3 + 0.5 * mx * mx * m5
            v_c = 0.5 * m1 - my * m4 + 0.5 * my * my * m5
            v_b = m2 - my * m3 - mx * m4 + mx * my * m5

            zeros = jnp.zeros_like(v_mx)
            new_out = jnp.concatenate(
                [v_mx, v_my, v_a, v_b, v_c, v_opac,
                 _row(v_color, 0), _row(v_color, 1), _row(v_color, 2),
                 v_absx, v_absy, zeros, zeros, zeros, zeros, zeros],
                axis=0,
            )

            @pl.when(kk >= 2)
            def _():
                out_dma(k + 2, slot).wait()

            @pl.when(boundary)
            def _():
                pltpu.make_async_copy(
                    dfeats_ref.at[
                        :, pl.ds(pl.multiple_of(base, CHUNK), CHUNK)
                    ],
                    rbuf_ref, sem_rd,
                ).wait()
                in_range = (gpos >= start) & (gpos < end)
                dbuf_ref[slot] = jnp.where(in_range, new_out, rbuf_ref[...])

            @pl.when(jnp.logical_not(boundary))
            def _():
                dbuf_ref[slot] = new_out

            out_dma(k, slot).start()
            tstate_ref[...] = tstate_ref[...] * rc[:, 0:1]
            sstate_ref[...] = sstate_ref[...] + jnp.sum(
                dw, axis=1, keepdims=True
            )
            return 0

        jax.lax.fori_loop(0, num_chunks, body, 0)

        @pl.when(num_chunks >= 1)
        def _():
            out_dma(0, 0).wait()

        @pl.when(num_chunks >= 2)
        def _():
            out_dma(1, 1).wait()

    return kernel


def run_variant(name, kern, feats, tile_offsets, basis, gimg_t, gt_t,
                tfin_t, last_t, num_tiles):
    p = basis.shape[0]
    i_pad = feats.shape[1]
    zeros_init = jnp.zeros((NUM_GRAD_FEATURES, i_pad), jnp.float32)
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
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        scratch_shapes=[
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((2, NUM_FEATURES, CHUNK), jnp.float32),
            pltpu.VMEM((2, NUM_GRAD_FEATURES, CHUNK), jnp.float32),
            pltpu.VMEM((NUM_GRAD_FEATURES, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    def outer(offsets, feats_r, basis_r, gimg_r, gt_r, tfin_r, last_r,
              zeros_r, dfeats_r, *rest):
        del zeros_r
        kern(offsets, feats_r, basis_r, gimg_r, gt_r, tfin_r, last_r,
             dfeats_r, *rest)

    call = pl.pallas_call(
        outer,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NUM_GRAD_FEATURES, i_pad), jnp.float32)
        ],
        input_output_aliases={7: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    @jax.jit
    def f(feats, offs, gimg_t, gt_t, tfin_t, last_t):
        return call(
            offs, feats, basis, gimg_t, gt_t[..., None],
            tfin_t[..., None], last_t[..., None], zeros_init,
        )[0].sum()

    r = f(feats, tile_offsets, gimg_t, gt_t, tfin_t, last_t)
    jax.block_until_ready(r)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(feats, tile_offsets, gimg_t, gt_t, tfin_t, last_t)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 800
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3)
    cap = model.capacity
    from easy_gaussian_splatting_tpu.ops.sh import eval_sh_color
    from easy_gaussian_splatting_tpu.training.config import config_from_dict

    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    isect_cap = -(-int(cfg.isect_mult * cap) // 128) * 128
    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    params, alive = model.params, model.alive
    geom = image_geometry(h, w, cfg.tile_size)
    basis_arr = tile_pixel_basis(geom)

    @jax.jit
    def make_residuals(params):
        scales = jnp.exp(params.log_scales)
        opac = jax.nn.sigmoid(params.logit_opacities) * alive
        intr = CameraIntrinsics.from_K(K, w, h)
        proj = project_gaussians(params.means, params.quats, scales, w2c,
                                 intr)
        dirs = params.means / jnp.maximum(
            jnp.linalg.norm(params.means, axis=-1, keepdims=True), 1e-8
        )
        colors = eval_sh_color(
            3, jnp.concatenate([params.sh_0, params.sh_rest], 1), dirs
        )
        opac = opac * (proj.radii > 0)
        radii = jnp.where(opac > 0.0, proj.radii, 0.0)
        geom_, binning, feats = _prepare(
            proj.means2d, proj.conics, colors, opac, radii, proj.depths,
            h, w, cfg.tile_size, cfg.max_tiles, cfg.max_tiles, isect_cap,
        )
        rgb_t, tfin_t, last_t = tiled_forward(
            feats, binning.tile_offsets, basis_arr, geom.num_tiles
        )
        return binning.tile_offsets, feats, tfin_t, last_t

    offs, feats, tfin_t, last_t = jax.block_until_ready(
        make_residuals(params)
    )
    g_img = jnp.ones((h, w, 3), jnp.float32)
    g_t = jnp.ones((h, w), jnp.float32)
    gimg_t = jnp.swapaxes(image_to_tiles(g_img, geom, h, w), 1, 2)
    gt_t = image_to_tiles(g_t, geom, h, w)

    global basis, zeros_init  # used inside run_variant's jit
    basis = basis_arr

    variants = [
        ("full (baseline)", dict(scans=True, geomgrad=True, matmuls=True)),
        ("no lane scans", dict(scans=False, geomgrad=True, matmuls=True)),
        ("no geom grads", dict(scans=True, geomgrad=False, matmuls=True)),
        ("no big matmuls", dict(scans=True, geomgrad=True, matmuls=False)),
        ("bare (none)", dict(scans=False, geomgrad=False, matmuls=False)),
    ]
    for name, flags in variants:
        kern = make_bwd_kernel(**flags)
        run_variant(name, kern, feats, offs, basis_arr, gimg_t, gt_t,
                    tfin_t, last_t, geom.num_tiles)


if __name__ == "__main__":
    main()
