"""Device build pipeline (ops/build.py) vs the host reference build."""

import numpy as np

import jax.numpy as jnp

from probly_search_tpu.ops.build import csr_offsets, sort_and_count


def test_sort_and_count_matches_numpy():
    rng = np.random.default_rng(0)
    N, T, D, F = 5000, 40, 60, 2
    term = rng.integers(0, T, N).astype(np.int32)
    doc = rng.integers(0, D, N).astype(np.int32)
    field = rng.integers(0, F, N).astype(np.int32)

    t, d, tail, tf = sort_and_count(
        jnp.asarray(term), jnp.asarray(doc), jnp.asarray(field), F
    )
    t, d, tail, tf = map(np.asarray, (t, d, tail, tf))

    # Reference counting with numpy.
    expected = {}
    for i in range(N):
        expected.setdefault((term[i], doc[i]), np.zeros(F, np.int64))[field[i]] += 1

    rows_t = t[tail]
    rows_d = d[tail]
    rows_tf = tf[tail]
    assert len(rows_t) == len(expected)
    # rows sorted by (term, doc)
    assert np.all((np.diff(rows_t) > 0) | ((np.diff(rows_t) == 0) & (np.diff(rows_d) > 0)))
    for rt, rd, rtf in zip(rows_t, rows_d, rows_tf):
        assert np.array_equal(rtf, expected[(rt, rd)]), (rt, rd)

    offs = np.asarray(csr_offsets(jnp.asarray(t), jnp.asarray(tail), T))
    counts = np.bincount(rows_t, minlength=T)
    assert np.array_equal(np.diff(offs), counts)
    assert offs[0] == 0 and offs[-1] == len(rows_t)


def test_sort_and_count_single_runs():
    # Every (term, doc) unique: every entry is a tail with tf one-hot.
    term = np.arange(10, dtype=np.int32)
    doc = np.zeros(10, dtype=np.int32)
    field = np.zeros(10, dtype=np.int32)
    t, d, tail, tf = sort_and_count(jnp.asarray(term), jnp.asarray(doc), jnp.asarray(field), 1)
    assert np.all(np.asarray(tail))
    assert np.all(np.asarray(tf)[:, 0] == 1)
