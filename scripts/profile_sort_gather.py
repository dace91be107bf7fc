"""Trustworthy micro-costs of binning's sort/gather/scatter primitives.

Measurement rules learned the hard way on the remote-TPU tunnel:
  - jax.block_until_ready can return before device execution finishes
    here; only a device->host FETCH forces completion. Every timing
    below fetches a tiny slice of the result.
  - identical (executable, args) dispatches can be served from a cache;
    every call carries a distinct seed folded into the data.
  - per-call RTT is ~30 ms; each primitive runs inside one jitted
    lax.fori_loop, and cost = (wall(300 iters) - wall(30 iters)) / 270,
    which cancels RTT and compile-cache effects.

Usage: python scripts/profile_sort_gather.py [C] [M] [I]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def timeit(name, body, init):
    """body: carry -> carry (int32 leaves get seed-folded)."""

    def make(iters):
        @jax.jit
        def run(seed, x):
            x = jax.tree.map(
                lambda v: v ^ seed if v.dtype == jnp.int32 else v + seed, x
            )
            out = jax.lax.fori_loop(0, iters, lambda i, x: body(x), x)
            return jax.tree.leaves(out)[0].reshape(-1)[:8]
        return run

    walls = {}
    for iters in (30, 300):
        run = make(iters)
        np.asarray(run(jnp.int32(0), init))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(1), init))
        walls[iters] = time.perf_counter() - t0
    dt = (walls[300] - walls[30]) / 270 * 1e3
    print(f"{name:48s} {dt:8.3f} ms")
    return dt


def main():
    c = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    i = int(sys.argv[3]) if len(sys.argv) > 3 else 393216
    rng = np.random.default_rng(0)
    print(f"C={c} M={m} I={i}   (cost = marginal per-iter over 270 iters)")

    keys = jnp.asarray(rng.integers(0, 2**30, size=(c * m,)).astype(np.int32))
    pay = jnp.asarray(rng.permutation(c * m).astype(np.int32))
    g9 = jnp.asarray(rng.uniform(size=(c, 9)).astype(np.float32))
    g16 = jnp.asarray(rng.uniform(size=(c, 16)).astype(np.float32))
    ranks = jnp.asarray(rng.integers(0, c, size=(i,)).astype(np.int32))
    order = jnp.asarray(rng.permutation(c).astype(np.int32))
    dsum = jnp.asarray(rng.uniform(size=(i, 12)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(size=(c,)).astype(np.float32))

    def pk(k):  # cheap data-dependent perturbation
        return k ^ jnp.roll(k, 1)

    timeit("xor+roll C*M (perturb baseline)", pk, keys)
    timeit("1-op i32 sort C*M",
           lambda k: pk(jax.lax.sort(k, is_stable=False)), keys)
    timeit("2-op i32 sort C*M (key+payload)",
           lambda kp: tuple(pk(x) for x in
                            jax.lax.sort(kp, num_keys=1, is_stable=False)),
           (keys, pay))
    timeit("2-op i32 STABLE sort C*M",
           lambda kp: tuple(pk(x) for x in
                            jax.lax.sort(kp, num_keys=1, is_stable=True)),
           (keys, pay))
    timeit("argsort C (f32 key)",
           lambda d: jnp.argsort(d).astype(jnp.float32) * 1e-9 + d, depths)
    timeit("searchsorted 626 in C*M",
           lambda k: k.at[:626].add(jnp.searchsorted(
               k, jnp.arange(626, dtype=jnp.int32))), keys)

    timeit("row gather [C,9] by order",
           lambda o: (o + g9[o].sum(1).astype(jnp.int32) % 3) % c, order)
    timeit("row gather [I,9] by ranks",
           lambda r: (r + g9[r].sum(1).astype(jnp.int32) % 3) % c, ranks)
    timeit("row gather [I,16] by ranks",
           lambda r: (r + g16[r].sum(1).astype(jnp.int32) % 3) % c, ranks)
    timeit("1D scalar gather [I] (order[ranks])",
           lambda r: (r + order[r]) % c, ranks)
    timeit("scatter-add [I,12] -> [C,12]",
           lambda r: (r + jnp.zeros((c, 12), jnp.float32).at[r].add(dsum)
                      [0, 0].astype(jnp.int32)) % c, ranks)
    timeit("scatter-set rows [C,12] by perm",
           lambda o: (o + jnp.zeros((c, 12), jnp.float32).at[o].set(
               g16[:, :12], unique_indices=True)[0, 0].astype(jnp.int32))
           % c, order)


if __name__ == "__main__":
    main()
