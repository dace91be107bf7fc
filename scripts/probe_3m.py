"""Localize the 3M-Gaussian TPU worker crash (BENCH_r03 scale_probe).

Theory: the backward's row-major [I_pad, 128] f32 gradient buffer crosses
2^31 bytes at i_pad > 4,194,304 rows, overflowing int32 byte offsets in
the Mosaic DMA address arithmetic ("kernel fault" worker crash).

Probes (each in a fresh subprocess so one fault doesn't kill the rest):
  bwd I   -- tiled_backward alone at i_pad rows (I*512 bytes)
  fwd I   -- tiled_forward alone (feats is [16, I]: 64 B/row, never >2GB)
  gather I -- plain XLA row gather from an [I, 128] f32 array
Usage: python scripts/probe_3m.py <probe> <rows>
       python scripts/probe_3m.py all   (runs the matrix via subprocesses)
"""

import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_probe(kind: str, rows: int, pad_rows: int = 0) -> None:
    import jax
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import (
        CHUNK,
        tiled_backward,
        tiled_forward,
    )
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        image_geometry,
        tile_pixel_basis,
    )

    from easy_gaussian_splatting_tpu.ops.pallas.tile_raster import GRAD_DTYPE

    i_pad = -(-max(rows, pad_rows) // CHUNK) * CHUNK + CHUNK
    bpr = 128 * jnp.dtype(GRAD_DTYPE).itemsize
    print(f"[probe {kind}] rows={rows} i_pad={i_pad} "
          f"dfeats_bytes={i_pad * bpr:,} (2^31={2**31:,})", flush=True)

    if kind == "gather":
        @jax.jit
        def f(x, p):
            return x[p].sum()

        x = jnp.ones((i_pad, 128), jnp.float32)
        p = jnp.asarray(
            np.random.default_rng(0).permutation(i_pad).astype(np.int32)
        )
        print("gather sum:", float(f(x, p)), flush=True)
        return

    h = w = 800
    ts = 32
    geom = image_geometry(h, w, ts)
    t = geom.num_tiles
    p_pix = ts * ts
    basis = tile_pixel_basis(geom)

    rng = np.random.default_rng(0)
    # spread isects evenly over tiles
    per = rows // t
    offsets = np.minimum(np.arange(t + 1) * per, rows).astype(np.int32)
    feats = np.zeros((16, i_pad), np.float32)
    # benign gaussian-ish features: small conics, mid opacity
    n = i_pad
    feats[0] = 0.01  # 0.5a
    feats[1] = 0.01  # 0.5c
    feats[2] = 0.0
    feats[3] = -0.01 * 16.0
    feats[4] = -0.01 * 16.0
    feats[5] = 0.01 * 16 * 16 * 2
    feats[6] = -np.log(0.5)
    feats[7] = 16.0
    feats[8:11] = rng.uniform(0.2, 0.8, size=(3, n)).astype(np.float32)
    feats[11] = 0.02
    feats[12] = 0.0
    feats[13] = 0.02
    feats[14] = 16.0
    feats_j = jnp.asarray(feats)
    off_j = jnp.asarray(offsets)
    basis_j = jnp.asarray(basis)

    if kind == "fwd":
        rgb, tfin, last = jax.jit(
            lambda f, o, b: tiled_forward(f, o, b, t)
        )(feats_j, off_j, basis_j)
        print("fwd rgb sum:", float(jnp.sum(rgb)), flush=True)
        return

    # backward needs forward residuals
    rgb, tfin, last = jax.jit(
        lambda f, o, b: tiled_forward(f, o, b, t)
    )(feats_j, off_j, basis_j)
    gimg = jnp.ones((t, 3, p_pix), jnp.float32)
    gt = jnp.zeros((t, p_pix), jnp.float32)
    dfeats = jax.jit(
        lambda f, o, b, gi, g, tf, la: tiled_backward(
            f, o, b, gi, g, tf, la
        )
    )(feats_j, off_j, basis_j, gimg, gt, tfin, last)
    print("bwd dfeats sum:", float(jnp.sum(dfeats[:, :12])), flush=True)


def main():
    if len(sys.argv) >= 3:
        run_probe(
            sys.argv[1], int(sys.argv[2]),
            int(sys.argv[3]) if len(sys.argv) >= 4 else 0,
        )
        return
    # bisect matrix: (kind, live rows, padded buffer rows). The pad-only
    # case separates "the kernel's WORK at this scale" from "the output
    # BUFFER at this scale" (boundary windows + aliased zeros included).
    matrix = [
        ("bwd", 2_000_000, 4_300_000),  # small work, >2^31 buffer
        ("bwd", 3_000_000, 0),
        ("bwd", 3_600_000, 0),
        ("bwd", 4_000_000, 0),
    ]
    for kind, rows, pad in matrix:
        try:
            r = subprocess.run(
                [sys.executable, __file__, kind, str(rows), str(pad)],
                capture_output=True, text=True, timeout=900,
            )
            tail = (r.stdout + r.stderr).strip().splitlines()
            status = "OK" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        except subprocess.TimeoutExpired as e:
            tail = ((e.stdout or "") + (e.stderr or "")).strip().splitlines()
            status = "TIMEOUT (hang)"
        print(f"=== {kind} {rows} pad={pad}: {status}")
        for line in tail[-4:]:
            print("   ", line)
        sys.stdout.flush()
        time.sleep(30)  # let a crashed worker restart before reconnecting


if __name__ == "__main__":
    import time

    main()
