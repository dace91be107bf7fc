"""Microbench: per-row cost of TPU gathers vs source layout and index
structure, at the 1M-gaussian scale (I=2.55M rows from a C=1.57M table).

Questions this answers (drives the backward-reduction design):
- does the source's minor-dim width (9 / 16 / 128) change the per-row
  gather cost?
- monotone vs random indices?
- gather vs duplicate-scatter-add.

Timing per the tunnel rules (CLAUDE.md): chained fori_loop with a data
dependency, marginal over (10, 40) iterations, fetch-forced. Big arrays
are passed as ARGUMENTS (closed-over constants get embedded in the
remote-compile request and blow its size limit).

Usage: python scripts/profile_gather.py [I] [C]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ITERS = (10, 40)


def timeit(name, fn, *args):
    def make(iters):
        @jax.jit
        def run(seed, *args):
            def body(i, carry):
                x, rest = carry[0], carry[1:]
                out = fn(x, *rest)
                # consume the WHOLE output (a single-element consumer
                # lets XLA dead-code-eliminate most of the gather)
                bump = (
                    jnp.sum(out) * 0.0
                    + seed.astype(jnp.float32) * 1e-30
                )
                return (x + bump,) + rest
            carry = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((8,), jnp.float32),) + args
            )
            return carry[0][:8]
        return run

    walls = {}
    for iters in ITERS:
        run = make(iters)
        np.asarray(run(jnp.int32(0), *args))
        t0 = time.perf_counter()
        np.asarray(run(jnp.int32(1), *args))
        walls[iters] = time.perf_counter() - t0
    dt = (walls[ITERS[1]] - walls[ITERS[0]]) / (ITERS[1] - ITERS[0]) * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    i_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_554_368
    c_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_572_864
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(
        rng.integers(0, c_rows, size=i_rows).astype(np.int32)
    )
    idx_mono = jnp.asarray(
        np.sort(rng.integers(0, i_rows, size=c_rows)).astype(np.int32)
    )

    for w in (9, 16, 128):
        table = jnp.asarray(rng.normal(size=(c_rows, w)).astype(np.float32))
        timeit(
            f"gather I={i_rows/1e6:.1f}M rows from [C, {w}]",
            lambda x, t, i: (t + x[0] * 0.0)[i],
            table, idx_rand,
        )

    for w in (12, 16, 128):
        src = jnp.asarray(rng.normal(size=(i_rows, w)).astype(np.float32))
        timeit(
            f"gather C={c_rows/1e6:.1f}M MONOTONE rows from [I, {w}]",
            lambda x, s, i: (s + x[0] * 0.0)[i],
            src, idx_mono,
        )

    src128 = jnp.asarray(rng.normal(size=(i_rows, 128)).astype(np.float32))
    timeit(
        "gather C MONOTONE rows from [I, 128], slice 12",
        lambda x, s, i: (s + x[0] * 0.0)[i][:, :12],
        src128, idx_mono,
    )

    rows12 = jnp.asarray(rng.normal(size=(i_rows, 12)).astype(np.float32))
    timeit(
        "scatter-ADD I rows (dup idx) into [C, 12]",
        lambda x, r, i: jnp.zeros((c_rows, 12), jnp.float32)
        .at[i]
        .add(r + x[0] * 0.0),
        rows12, idx_rand,
    )


if __name__ == "__main__":
    main()
