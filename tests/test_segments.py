"""Interpret-mode tests for the sorted-segment Pallas kernels
(``ops/pallas/segments.py``) against numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.ops.pallas.segments import (
    LANES,
    LOOK,
    R,
    monotone_expand,
    segsum_band,
    segsum_compact,
)


def _make_groups(rng, i_pad, n_groups, max_mult=16):
    """Non-decreasing group ids with multiplicity 1..max_mult, dead tail
    gets a sentinel group."""
    counts = rng.integers(1, max_mult + 1, size=n_groups)
    reps = np.repeat(np.arange(n_groups), counts)
    if len(reps) > i_pad:
        reps = reps[:i_pad]
    g = np.full(i_pad, n_groups + 7, np.int32)  # sentinel tail group
    g[: len(reps)] = reps
    return g


@pytest.mark.parametrize("nblocks", [1, 3])
def test_segsum_compact_matches_numpy(nblocks):
    rng = np.random.default_rng(0)
    i_pad = R * nblocks
    g = _make_groups(rng, i_pad, n_groups=i_pad // 3)
    rows = rng.normal(size=(i_pad, LANES)).astype(np.float32)

    out = np.asarray(
        segsum_compact(jnp.asarray(rows), jnp.asarray(g), interpret=True)
    )
    uniq, inv = np.unique(g, return_inverse=True)
    want = np.zeros((len(uniq), LANES), np.float32)
    np.add.at(want, inv, rows)
    np.testing.assert_allclose(
        out[: len(uniq)], want, rtol=0, atol=2e-4 * np.abs(want).max()
    )


def test_segsum_compact_group_spanning_blocks():
    """A single group spanning a whole block boundary exercises the
    carry path."""
    rng = np.random.default_rng(1)
    i_pad = R * 2
    g = np.zeros(i_pad, np.int32)
    g[700:] = 1  # group 0 spans block 0 into block 1
    rows = rng.normal(size=(i_pad, LANES)).astype(np.float32)
    out = np.asarray(
        segsum_compact(jnp.asarray(rows), jnp.asarray(g), interpret=True)
    )
    np.testing.assert_allclose(
        out[0], rows[:700].sum(0), atol=2e-4 * np.abs(rows).sum(0).max()
    )
    np.testing.assert_allclose(
        out[1], rows[700:].sum(0), atol=2e-4 * np.abs(rows).sum(0).max()
    )


def _suffix_sums(rows, g):
    """Numpy oracle: out[i] = sum of rows[j] for j >= i, g[j] == g[i]."""
    out = rows.copy()
    for i in range(len(rows) - 2, -1, -1):
        if g[i + 1] == g[i]:
            out[i] += out[i + 1]
    return out


@pytest.mark.parametrize("nblocks", [1, 3])
@pytest.mark.parametrize("dtype", [np.float32, "bf16"])
def test_segsum_band_matches_numpy(nblocks, dtype):
    rng = np.random.default_rng(4)
    i_k = R * nblocks + LOOK
    g = _make_groups(rng, i_k, n_groups=i_k // 3)
    rows = rng.normal(size=(i_k, LANES)).astype(np.float32)
    rows_in = (
        jnp.asarray(rows)
        if dtype is np.float32
        else jnp.asarray(rows).astype(jnp.bfloat16)
    )
    out = np.asarray(
        segsum_band(rows_in, jnp.asarray(g), interpret=True)
    )
    ref = rows if dtype is np.float32 else np.asarray(
        jnp.asarray(rows).astype(jnp.bfloat16).astype(jnp.float32)
    )
    want = _suffix_sums(ref, g)[: R * nblocks]
    np.testing.assert_allclose(
        out, want, rtol=0, atol=2e-4 * np.abs(want).max()
    )


def test_segsum_band_group_spanning_blocks():
    """Groups straddling the R-row block boundary must still get full
    suffix sums via the lookahead window (max group length = LOOK)."""
    rng = np.random.default_rng(5)
    i_k = 2 * R + LOOK
    g = np.arange(i_k, dtype=np.int32) // 7  # 7-row groups, unaligned
    rows = rng.normal(size=(i_k, LANES)).astype(np.float32)
    out = np.asarray(
        segsum_band(jnp.asarray(rows), jnp.asarray(g), interpret=True)
    )
    want = _suffix_sums(rows, g)[: 2 * R]
    np.testing.assert_allclose(
        out, want, rtol=0, atol=2e-4 * np.abs(want).max()
    )


def test_segsum_band_max_length_group_at_boundary():
    """A LOOK-row group starting on the last row of a block exercises
    the full lookahead depth."""
    rng = np.random.default_rng(6)
    i_k = R + LOOK
    g = np.zeros(i_k, np.int32)
    g[: R - 1] = np.arange(R - 1) // 3
    g[R - 1 :] = 10_000  # LOOK+1 rows... cap to LOOK
    g[R - 1 + LOOK :] = 20_000
    rows = rng.normal(size=(i_k, LANES)).astype(np.float32)
    out = np.asarray(
        segsum_band(jnp.asarray(rows), jnp.asarray(g), interpret=True)
    )
    want = _suffix_sums(rows, g)[:R]
    np.testing.assert_allclose(
        out, want, rtol=0, atol=2e-4 * np.abs(want).max()
    )


@pytest.mark.parametrize("c_pad", [R, 2 * R])
def test_monotone_expand_matches_numpy(c_pad):
    rng = np.random.default_rng(2)
    present = rng.uniform(size=c_pad) < 0.7
    rank = np.cumsum(present) - present  # exclusive prefix
    n_in = int(present.sum())
    compact = rng.normal(size=(max(n_in, 1), LANES)).astype(np.float32)

    out = np.asarray(
        monotone_expand(
            jnp.asarray(compact),
            jnp.asarray(rank.astype(np.int32)),
            jnp.asarray(present),
            interpret=True,
        )
    )
    want = np.zeros((c_pad, LANES), np.float32)
    want[present] = compact[rank[present]]
    np.testing.assert_allclose(
        out, want, rtol=0, atol=1e-4 * np.abs(compact).max()
    )


def test_roundtrip_segsum_then_expand():
    """The rasterizer composition: segment sums compacted, then expanded
    to dense group space."""
    rng = np.random.default_rng(3)
    i_pad = R * 4
    c_pad = R * 2
    # groups in [0, c_pad) with gaps (absent groups)
    n_groups = c_pad
    counts = rng.integers(0, 4, size=n_groups)
    reps = np.repeat(np.arange(n_groups), counts)[:i_pad]
    g = np.full(i_pad, n_groups + 3, np.int32)
    g[: len(reps)] = reps
    rows = rng.normal(size=(i_pad, LANES)).astype(np.float32)

    compact = segsum_compact(
        jnp.asarray(rows), jnp.asarray(g), interpret=True
    )
    present = counts > 0
    rank = (np.cumsum(present) - present).astype(np.int32)
    out = np.asarray(
        monotone_expand(
            compact, jnp.asarray(rank), jnp.asarray(present),
            interpret=True,
        )
    )
    want = np.zeros((c_pad, LANES), np.float32)
    np.add.at(want, reps, rows[: len(reps)])
    np.testing.assert_allclose(
        out, want, rtol=0, atol=2e-4 * max(np.abs(want).max(), 1.0)
    )
