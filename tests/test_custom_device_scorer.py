"""User-pluggable scorers on the device path.

Pluggable scoring is a headline reference feature (`README.md:19`, the
`ScoreCalculator` trait).  A custom scorer implementing the device protocol
(device_term_scale + device_score_lanes, models/base.py) must run through
query_batch as a batched device program with host-path-identical results.
"""

import numpy as np

from probly_search_tpu import Index
from probly_search_tpu.models.base import BaseScoreCalculator
from .util import tokenizer


class TfBoost(BaseScoreCalculator):
    """score = sum_f tf_f * boost_f (per posting), max-within-term /
    sum-across-terms merged like any scorer."""

    device_needs_finalize = False
    device_excludes_nonpositive = True

    def device_cache_key(self):
        return ("tfboost",)

    def score(self, before, pointer, details, node, field_data, term):
        s = float(
            sum(tf * b for tf, b in zip(pointer.term_frequency, field_data.fields_boost))
        )
        return s if s > 0 else None

    def device_term_scale(self, df, n_docs, expansion_boost):
        return np.ones(len(df), np.float32)

    def device_score_lanes(self, lanes):
        import jax.numpy as jnp

        per_field = lanes.tf * lanes.fields_boost[:, None]
        return jnp.sum(per_field, axis=-2) * lanes.scale  # scale is per-lane


def _one(d):
    return [d]


def test_custom_device_scorer_matches_host():
    ix = Index(1)
    ix.add_documents_columnar(
        list(range(120)), [[f"a{i % 7} b{i % 3} c" for i in range(120)]]
    )
    scorer = TfBoost()
    qs = ["a3 b1", "c", "a", "zzz", ""]
    rows = ix.query_batch(qs, scorer, tokenizer, top_k=10, backend="device")
    for q, row in zip(qs, rows):
        oracle = ix.query(q, TfBoost(), tokenizer, [1.0], top_k=10)
        assert [r.key for r in row] == [r.key for r in oracle], q
        for a, b in zip(row, oracle):
            assert abs(a.score - b.score) < 1e-5 * max(1.0, abs(b.score))


def test_custom_device_scorer_with_boosts_and_deletes():
    ix = Index(2)
    for i in range(40):
        ix.add_document(
            [lambda d: [d[0]], lambda d: [d[1]]],
            tokenizer,
            i,
            (f"t{i % 5} x", f"t{i % 5} t{i % 5} y"),
        )
    for i in range(10, 20):
        ix.remove_document(i)
    scorer = TfBoost()
    rows = ix.query_batch(["t3 y"], scorer, tokenizer, [3.0, 0.5], top_k=10)
    oracle = ix.query("t3 y", TfBoost(), tokenizer, [3.0, 0.5], top_k=10)
    assert [r.key for r in rows[0]] == [r.key for r in oracle]
    for a, b in zip(rows[0], oracle):
        assert abs(a.score - b.score) < 1e-5 * max(1.0, abs(b.score))
