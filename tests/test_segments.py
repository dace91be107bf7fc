"""Interpret-mode tests for the sorted-segment Pallas kernels
(``ops/pallas/segments.py``) against numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.ops.pallas.segments import (
    LANES,
    R,
    monotone_expand,
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
