"""Expansion-heavy queries and host-fallback paths (VERDICT r1 items 2/3).

The reference serves single-char prefix queries through the same trie DFS
as everything else (`/root/reference/src/query.rs:260-292`); here they tile
through the device job machinery by default (max_expansions=0), and any
query that does leave the device path lands on the scorer's vectorized
numpy host path — never a per-posting Python walk inside a serving batch.
"""

import random

import numpy as np
import pytest

from probly_search_tpu import Index, bm25, whitespace_tokenizer
from probly_search_tpu.config import IndexConfig

from .util import Doc, title_extract, tokenizer


def _rand_index(n=500, two_field=False, seed=3):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 5)))
        for _ in range(120)
    ]
    F = 2 if two_field else 1
    ix = Index(F)
    for i in range(n):
        title = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 6)))
        if two_field:
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
            ix.add_document(
                [lambda d: [d[0]], lambda d: [d[1]]],
                whitespace_tokenizer,
                i,
                (title, text),
            )
        else:
            ix.add_document([title_extract], tokenizer, i, Doc(id=i, title=title))
    for i in range(0, n, 17):
        ix.remove_document(i)
    return ix, vocab


class TestVectorizedBM25:
    def test_matches_exact_oracle(self):
        ix, vocab = _rand_index(two_field=True)
        rng = random.Random(5)
        queries = ["a", "b", "ab", ""]
        queries += [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
            for _ in range(20)
        ]
        queries += [rng.choice(vocab)[:1] for _ in range(5)]
        for boost in ([1.0, 1.0], [2.0, 0.5], [0.0, 1.0]):
            for q in queries:
                want = ix.query(q, bm25.new(), whitespace_tokenizer, boost)
                got = bm25.new().vectorized_query(
                    ix, q, whitespace_tokenizer, fields_boost=boost
                )
                assert [r.key for r in got] == [r.key for r in want], (q, boost)
                for g, w in zip(got, want):
                    assert g.score == pytest.approx(w.score, abs=1e-9), (q, boost)

    def test_top_k_and_params(self):
        ix, vocab = _rand_index()
        scorer = bm25.new(bm25k1=0.9, bm25b=0.3)
        q = vocab[0][:1]
        want = ix.query(q, scorer, tokenizer, [1.0], top_k=7)
        got = scorer.vectorized_query(ix, q, tokenizer, top_k=7)
        assert [(r.key, round(r.score, 10)) for r in got] == [
            (r.key, round(r.score, 10)) for r in want
        ]

    def test_subclass_with_custom_score_uses_exact_path(self):
        class Doubled(bm25.BM25):
            def score(self, *a, **kw):
                s = super().score(*a, **kw)
                return None if s is None else 2.0 * s

        ix, vocab = _rand_index(n=60)
        q = vocab[1]
        want = ix.query(q, Doubled(), tokenizer, [1.0])
        got = Doubled().vectorized_query(ix, q, tokenizer)
        assert [(r.key, r.score) for r in got] == [(r.key, r.score) for r in want]


class TestExpansionTiling:
    def test_single_char_query_runs_on_device(self):
        """Expansion-heavy queries stay on the device path by default."""
        ix, vocab = _rand_index(n=800)
        dix = ix.device_index()
        plan, fallback = dix.plan_batch(["a", "b c", vocab[0]], tokenizer, bm25.new())
        assert fallback == []
        rows = ix.query_batch(["a"], bm25.new(), tokenizer, top_k=10)[0]
        full = {r.key: r.score for r in ix.query("a", bm25.new(), tokenizer, [1.0])}
        want = ix.query("a", bm25.new(), tokenizer, [1.0], top_k=10)
        assert len(rows) == len(want)
        for a, b in zip(rows, want):
            assert abs(a.score - b.score) < 2e-5 * max(1.0, abs(b.score))
        for a in rows:
            assert abs(a.score - full[a.key]) < 2e-5 * max(1.0, abs(full[a.key]))

    def test_configured_cap_falls_back_vectorized(self):
        cfg = IndexConfig(max_expansions=2)
        _, vocab = _rand_index(n=50)
        rng = random.Random(3)
        ix2 = Index(1, config=cfg)
        for i in range(300):
            ix2.add_document(
                [title_extract],
                tokenizer,
                i,
                Doc(id=i, title=" ".join(rng.choice(vocab) for _ in range(3))),
            )
        from probly_search_tpu.utils.metrics import metrics

        before = metrics.counters["device_fallback_queries"]
        rows = ix2.query_batch(["a", vocab[0]], bm25.new(), tokenizer, top_k=10)
        assert metrics.counters["device_fallback_queries"] > before
        want = ix2.query("a", bm25.new(), tokenizer, [1.0], top_k=10)
        assert [r.key for r in rows[0]] == [r.key for r in want]
        for a, b in zip(rows[0], want):
            assert a.score == pytest.approx(b.score, rel=1e-9)

    def test_lane_budget_guard(self, monkeypatch):
        from probly_search_tpu.index.device import DeviceIndex

        ix, vocab = _rand_index(n=400)
        monkeypatch.setattr(DeviceIndex, "LANES_PER_DISPATCH", 4096)
        ix._device_cache = None  # rebuild snapshot under the tiny budget
        rows = ix.query_batch(["a"], bm25.new(), tokenizer, top_k=10)[0]
        want = ix.query("a", bm25.new(), tokenizer, [1.0], top_k=10)
        assert [r.key for r in rows] == [r.key for r in want]
        for a, b in zip(rows, want):
            assert a.score == pytest.approx(b.score, rel=1e-9)
