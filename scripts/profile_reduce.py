"""A/B the backward per-Gaussian reduction variants at bench-1M shapes:
capacity C=1.57M, icap=2.56M, M=16. Honest tunnel timing: device-side
slice fetch, min of 3.

Variants:
  scan-fm   (round-2): [p] gather 12-wide -> transpose -> 4 lane-shift
            segmented passes -> transpose back -> starts row gather
  scan-row  : [p] gather full 128 rows -> 4 row-shift masked passes ->
            starts row gather -> slice
  pieces    : each stage alone
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

C = 1_572_864
ICAP = 2_560_000 // 128 * 128 + 128  # CHUNK-rounded
IPAD = ICAP + 128
M = 16


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
    print(f"{name:52s} {min(times)*1e3:9.2f} ms", flush=True)


@jax.jit
def setup(seed):
    k = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(k, 3)
    dfeats = jax.random.uniform(k1, (IPAD, 128), jnp.float32)
    # realistic flat ids: ~1.97M live (sorted groups of <=M), dead tail
    n_live = 1_965_000
    counts = jax.random.randint(k2, (C,), 0, 3)  # avg ~1 per gaussian
    flat_base = jnp.cumsum(counts)
    live_flat = jnp.repeat(
        jnp.arange(C, dtype=jnp.int32) * M,
        counts,
        total_repeat_length=ICAP,
    )
    flat = jnp.where(
        jnp.arange(ICAP) < n_live, live_flat, jnp.int32(C * M)
    )
    p = jax.random.permutation(k3, ICAP).astype(jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts.astype(jnp.int32))[:-1]]
    )
    cnts = counts.astype(jnp.int32)
    return dfeats, flat, p, starts, cnts


def chain_fm(dfeats, flat_asc, p, starts, counts):
    rows = dfeats[:ICAP, :12][p]
    rt = jnp.swapaxes(rows, 0, 1)  # [12, I]
    g = flat_asc // M
    k = 1
    while k < M:
        g_ahead = jnp.concatenate([g[k:], jnp.full((k,), -1, jnp.int32)])
        same = (g_ahead == g)[None, :]
        rt_ahead = jnp.concatenate(
            [rt[:, k:], jnp.zeros((rt.shape[0], k), rt.dtype)], axis=1
        )
        rt = rt + jnp.where(same, rt_ahead, 0.0)
        k *= 2
    sums = jnp.swapaxes(rt, 0, 1)
    have = counts > 0
    return jnp.where(
        have[:, None], sums[jnp.minimum(starts, ICAP - 1)], 0.0
    )


def chain_row(dfeats, flat_asc, p, starts, counts):
    rows = dfeats[p]  # [I, 128]
    g = flat_asc // M
    k = 1
    while k < M:
        g_ahead = jnp.concatenate([g[k:], jnp.full((k,), -1, jnp.int32)])
        same = (g_ahead == g)[:, None]
        rows_ahead = jnp.concatenate(
            [rows[k:], jnp.zeros((k, rows.shape[1]), rows.dtype)], axis=0
        )
        rows = rows + jnp.where(same, rows_ahead, 0.0)
        k *= 2
    have = counts > 0
    return jnp.where(
        have[:, None], rows[jnp.minimum(starts, ICAP - 1)][:, :12], 0.0
    )


def main():
    dfeats, flat, p, starts, counts = setup(0)
    jax.block_until_ready(dfeats)
    print("setup done", flush=True)

    timed("flat sort (flats, iota) [icap]", lambda f: jax.lax.sort(
        (f, jnp.arange(ICAP, dtype=jnp.int32)), num_keys=1,
        is_stable=False), flat)
    timed("gather 12-wide src [icap]",
          lambda f, pp: f[:ICAP, :12][pp], dfeats, p)
    timed("gather full-width [icap]", lambda f, pp: f[pp], dfeats, p)
    timed("FULL chain fm (round-2)", chain_fm, dfeats, flat, p, starts,
          counts)
    timed("FULL chain row-major", chain_row, dfeats, flat, p, starts,
          counts)
    # stage isolates
    rows128 = jax.jit(lambda f, pp: f[pp])(dfeats, p)
    g = jax.jit(lambda f: f // M)(flat)

    def scan_only_row(rows, g):
        k = 1
        while k < M:
            g_ahead = jnp.concatenate(
                [g[k:], jnp.full((k,), -1, jnp.int32)])
            same = (g_ahead == g)[:, None]
            rows_ahead = jnp.concatenate(
                [rows[k:], jnp.zeros((k, rows.shape[1]), rows.dtype)],
                axis=0)
            rows = rows + jnp.where(same, rows_ahead, 0.0)
            k *= 2
        return rows

    timed("row scan only (4 passes, 128 lanes)", scan_only_row, rows128, g)
    timed("starts row-gather [C] from [I,128]",
          lambda r, s: r[jnp.minimum(s, ICAP - 1)], rows128, starts)


if __name__ == "__main__":
    main()
