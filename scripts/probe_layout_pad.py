"""Measure whether narrow per-Gaussian arrays ([C,3]/[C,4]) physically
move 512-B padded rows on TPU — i.e., whether packing the 59-float
Gaussian state into one [C,64] matrix would cut parameter/Adam traffic.

Times (tunnel-honest: jitted fori_loop with data dependency, subtract a
shorter run) an elementwise triad over:
  a) six separate narrow arrays ([C,3]x3, [C,4], [C,1], [C,45])
  b) one packed [C,64] array of identical total logical bytes
and reports device memory_stats deltas for each allocation.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

C = int(sys.argv[1]) if len(sys.argv) > 1 else 1_572_864


def mem_used():
    st = jax.devices()[0].memory_stats()
    return st.get("bytes_in_use", 0) if st else 0


def timed_loop(fn, args, iters):
    f = jax.jit(fn, static_argnames=("n",))
    out = f(*args, n=2)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = {}
    for n in (2, 12):
        best = 1e9
        for rep in range(3):
            # tunnel rule: distinct data per dispatch (identical
            # (executable, args) pairs can be served from a cache)
            seeded = tuple(a + jnp.float32(1e-6) * (rep + 1) for a in args)
            t0 = time.perf_counter()
            out = f(*seeded, n=n)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[12] - ts[2]) / 10.0


def main():
    rng = np.random.default_rng(0)
    m0 = mem_used()
    narrow = [
        jnp.asarray(rng.normal(size=(C, k)).astype(np.float32))
        for k in (3, 3, 4, 3, 45, 1)
    ]
    jax.block_until_ready(narrow)
    m1 = mem_used()
    packed = jnp.asarray(rng.normal(size=(C, 64)).astype(np.float32))
    jax.block_until_ready(packed)
    m2 = mem_used()
    logical_narrow = sum(C * k * 4 for k in (3, 3, 4, 3, 45, 1))
    print(
        f"C={C}: narrow alloc {m1-m0:,} B (logical {logical_narrow:,}), "
        f"ratio {(m1-m0)/max(logical_narrow,1):.2f}; "
        f"packed [C,64] alloc {m2-m1:,} B (logical {C*64*4:,}), "
        f"ratio {(m2-m1)/(C*64*4):.2f}",
        flush=True,
    )

    def triad_narrow(*arrs, n):
        def body(i, xs):
            return tuple(
                x * 1.000001 + 0.5 * jnp.float32(i) for x in xs
            )
        return jax.lax.fori_loop(0, n, body, arrs)

    def triad_packed(x, n):
        def body(i, x):
            return x * 1.000001 + 0.5 * jnp.float32(i)
        return jax.lax.fori_loop(0, n, body, x)

    t_n = timed_loop(triad_narrow, narrow, 12)
    t_p = timed_loop(triad_packed, (packed,), 12)
    bw_n = 2 * logical_narrow / max(t_n, 1e-9) / 1e9
    bw_p = 2 * C * 64 * 4 / max(t_p, 1e-9) / 1e9
    print(
        f"elementwise triad per pass: narrow {t_n*1e3:.2f} ms "
        f"({bw_n:.0f} GB/s logical), packed {t_p*1e3:.2f} ms "
        f"({bw_p:.0f} GB/s logical)  [v5e HBM ~819 GB/s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
