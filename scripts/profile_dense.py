"""Isolate the dense-reduction ops at 1M-regime shapes (coarse, one call
per op — the suspect is O(seconds), far above the ~30 ms tunnel RTT)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

C = 1_000_000
B = 2
OV = 250_000
M = 16
D = C * B + OV * M  # 6.0M
ICAP = 2_600_000
IPAD = ICAP + 128

rng = np.random.default_rng(0)


def timed(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)  # compile
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        # force: fetch ONE element, sliced ON DEVICE (np.asarray of the
        # full array would stream it over the tunnel)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[:1])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{name:50s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    # generate everything ON DEVICE (host->device uploads of GB-scale
    # arrays crawl over the tunnel)
    @jax.jit
    def setup(seed):
        k = jax.random.PRNGKey(seed)
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        dense = jax.random.permutation(k1, D).astype(jnp.int32)
        dfeats = jax.random.uniform(k2, (IPAD, 128), jnp.float32)
        q = jax.random.randint(k3, (D,), 0, IPAD, jnp.int32)
        ov_id = jnp.sort(
            jax.random.permutation(k4, C)[:OV].astype(jnp.int32)
        )
        ov_rows = jax.random.uniform(k5, (OV, 12), jnp.float32)
        base = jax.random.uniform(k5, (C, 12), jnp.float32)
        return dense, dfeats, q, ov_id, ov_rows, base

    dense, dfeats, q, ov_id, ov_rows, base = setup(0)
    jax.block_until_ready(dfeats)
    print("setup done", flush=True)

    if which in ("all", "1"):
        timed("q sort (dense, iota) [D]", lambda d: jax.lax.sort(
            (d, jnp.arange(D, dtype=jnp.int32)), num_keys=1, is_stable=False
        )[1], dense)

        timed(
            "gather dfeats[q] full 128 [D]", lambda f, qq: f[qq], dfeats, q
        )
        timed(
            "gather dfeats[q, :12] [D]", lambda f, qq: f[qq, :12], dfeats, q
        )
        timed(
            "gather f[q] then slice :12",
            lambda f, qq: f[qq][:, :12], dfeats, q,
        )
    if which == "1":
        return

    rows12 = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(7), (D, 12), jnp.float32
        )
    )()
    rows128 = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(8), (D, 128), jnp.float32
        )
    )()
    timed(
        "reshape-sum A [C*B,12]->(C,B,12).sum(1)",
        lambda r: r[: C * B].reshape(C, B, 12).sum(axis=1), rows12,
    )
    timed(
        "reshape-sum A 128-wide + slice",
        lambda r: r[: C * B].reshape(C, B, 128).sum(axis=1)[:, :12],
        rows128,
    )
    timed(
        "reshape-sum B [OV*M,12]->(OV,M,12).sum(1)",
        lambda r: r[C * B :].reshape(OV, M, 12).sum(axis=1), rows12,
    )
    timed(
        "scatter-add unique [OV,12] into [C,12]",
        lambda b, i, v: b.at[i].add(v), base, ov_id, ov_rows,
    )
    timed(
        "fused: gather12 + reshape sums + scatter",
        lambda f, qq, b, i: b.at[i].add(
            f[qq][:, :12][C * B :].reshape(OV, M, 12).sum(axis=1)
        ) + f[qq][:, :12][: C * B].reshape(C, B, 12).sum(axis=1),
        dfeats, q, base, ov_id,
    )


if __name__ == "__main__":
    main()
