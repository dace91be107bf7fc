"""Microbenchmark of the backward gradient-reduction primitives.

The backward must reduce ~I=500k per-intersection gradient rows (12 f32
columns) to per-Gaussian rows (C=131k). Candidates:

  A. scatter-add with duplicate indices (current production path)
  B. scatter-set with UNIQUE indices into the [C*M] duplicate grid,
     then a dense [C, M, 12] sum over M
  C. scatter-add of the transposed [12, I] rows columnwise (12 x [I]
     scalar-column scatters)  -- checks whether row width matters
  D. gather-based control: gather I rows (the forward-side cost floor)

Fetch-forced marginal timing (see profile_step2.py).
Usage: python scripts/profile_scatter.py [C] [I] [M]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = (10, 40)


def timeit(name, stage, x0):
    def make(iters):
        @jax.jit
        def run(seed, x):
            def body(i, x):
                out = stage(x)
                bump = (
                    out.reshape(-1)[0] * 0.0
                    + seed.astype(jnp.float32) * 1e-30
                )
                return x + bump
            x = jax.lax.fori_loop(0, iters, body, x)
            return x.reshape(-1)[:8]
        return run

    walls = {}
    for iters in ITERS:
        run = make(iters)
        np.asarray(run(jnp.int32(0), x0))
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(1), x0))
        walls[iters] = time.perf_counter() - t0
    dt = (walls[ITERS[1]] - walls[ITERS[0]]) / (ITERS[1] - ITERS[0]) * 1e3
    print(f"{name:52s} {dt:8.3f} ms")
    return dt


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    i = int(sys.argv[2]) if len(sys.argv) > 2 else 497664
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    rng = np.random.default_rng(0)
    # duplicate-heavy indices like binning produces (sorted by tile, ~M/4
    # dups per gaussian)
    orig = jnp.asarray(rng.integers(0, c, size=(i,)), jnp.int32)
    # unique flat ids in the [C*M] duplicate grid
    j = np.zeros(i, np.int64)
    seen = {}
    orig_np = np.asarray(orig)
    for k in range(i):
        g = int(orig_np[k])
        j[k] = seen.get(g, 0) % m
        seen[g] = seen.get(g, 0) + 1
    flat = jnp.asarray(orig_np.astype(np.int64) * m + j, jnp.int32)
    rows0 = jnp.asarray(rng.uniform(size=(i, 12)).astype(np.float32))

    def s_scatter_add(rows):
        out = jnp.zeros((c, 12), jnp.float32).at[orig].add(rows)
        return out

    def s_scatter_set_unique(rows):
        grid = (
            jnp.zeros((c * m, 12), jnp.float32)
            .at[flat]
            .set(rows, unique_indices=True, indices_are_sorted=False)
        )
        return grid.reshape(c, m, 12).sum(axis=1)

    def s_scatter_add_unique_hint(rows):
        out = jnp.zeros((c, 12), jnp.float32).at[orig].add(
            rows, unique_indices=False
        )
        return out

    def s_gather(rows):
        big = jnp.zeros((c, 12), jnp.float32) + rows[:c]
        return big[orig[: c // 1]]  # gather C rows control

    def s_gather_i(rows):
        big = rows[:c]
        g = big.at[orig % c].get()  # I-row gather? use take
        return g

    sorted_orig = jnp.sort(orig)

    def s_scatter_add_sorted(rows):
        # timing probe: same row count, indices pre-sorted + hint
        out = jnp.zeros((c, 12), jnp.float32).at[sorted_orig].add(
            rows, indices_are_sorted=True
        )
        return out

    def s_segment_sum_sorted(rows):
        return jax.ops.segment_sum(
            rows, sorted_orig, num_segments=c, indices_are_sorted=True
        )

    perm_c = jnp.asarray(rng.permutation(c).astype(np.int32))

    def s_scatter_set_unique_small(rows):
        # per-row cost of scatter-SET with unique indices, small output
        out = jnp.zeros((c, 12), jnp.float32).at[perm_c].set(
            rows[:c], unique_indices=True
        )
        return out

    def s_cumsum_rows(rows):
        # cost of a [I, 12] prefix sum (segment-reduction building block)
        return jnp.cumsum(rows, axis=0)

    timeit("A scatter-ADD dup [I,12] -> [C,12]", s_scatter_add, rows0)
    timeit("B scatter-SET unique [I,12] -> [C*M,12] + reduce",
           s_scatter_set_unique, rows0)
    timeit("C gather I rows from [C,12] (control)",
           lambda r: r[:c][orig % c].sum(axis=0) + r.sum(0) * 0 + r[:c][orig % c][0],
           rows0)
    timeit("D scatter-ADD sorted idx [I,12] -> [C,12]",
           s_scatter_add_sorted, rows0)
    timeit("E segment_sum sorted [I,12] -> [C,12]",
           s_segment_sum_sorted, rows0)
    timeit("F scatter-SET unique [C,12] -> [C,12]",
           s_scatter_set_unique_small, rows0)
    timeit("G cumsum [I,12] (building block)", s_cumsum_rows, rows0)


if __name__ == "__main__":
    main()
