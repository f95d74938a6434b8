"""Regressions for the round-1 advisor findings (ADVICE.md)."""

import numpy as np
import pytest

from probly_search_tpu import Index, bm25, zero_to_one, whitespace_tokenizer
from probly_search_tpu.index import snapshot


def _one(d):
    return [d]


class TestZeroBoostExclusion:
    """Device backend must exclude docs whose total score is not > 0
    (bm25.rs:89-92 returns None), e.g. when fields_boost zeroes the only
    matching field."""

    def _index(self):
        ix = Index(2)
        ix.add_document(
            [lambda d: [d[0]], lambda d: [d[1]]],
            whitespace_tokenizer,
            0,
            ("x", "y"),
        )
        ix.add_document(
            [lambda d: [d[0]], lambda d: [d[1]]],
            whitespace_tokenizer,
            1,
            ("y q", "x"),
        )
        return ix

    def test_host_excludes_zero_scores(self):
        ix = self._index()
        assert ix.query("y", bm25.new(), whitespace_tokenizer, [1.0, 0.0]) == [
            r for r in ix.query("y", bm25.new(), whitespace_tokenizer, [1.0, 0.0])
        ]
        res = ix.query("y", bm25.new(), whitespace_tokenizer, [0.0, 1.0])
        assert [r.key for r in res] == [0]

    def test_device_matches_host_on_zero_boost(self):
        ix = self._index()
        for boost in ([1.0, 0.0], [0.0, 1.0], [0.0, 0.0]):
            host = ix.query("y", bm25.new(), whitespace_tokenizer, boost)
            dev = ix.device_index().query_batch(
                ["y"], bm25.new(), whitespace_tokenizer, boost, top_k=10
            )[0]
            assert [r.key for r in dev] == [r.key for r in host], boost
            for h, d in zip(host, dev):
                assert abs(h.score - d.score) < 1e-5 * max(1.0, abs(h.score))


class TestZeroToOneManyTermsBitmask:
    """vectorized_query must not overflow past 64 query terms."""

    def test_70_term_query_matches_oracle(self):
        n_terms = 70
        terms = [f"w{i:03d}" for i in range(n_terms)]
        ix = Index(1)
        ix.add_document([_one], whitespace_tokenizer, 0, " ".join(terms))
        ix.add_document([_one], whitespace_tokenizer, 1, " ".join(terms[:10]))
        query = " ".join(terms)
        oracle = ix.query(query, zero_to_one.new(), whitespace_tokenizer, [1.0])
        vec = zero_to_one.ZeroToOne.vectorized_query(ix, query, whitespace_tokenizer)
        assert [r.key for r in vec] == [r.key for r in oracle]
        for o, v in zip(oracle, vec):
            assert v.score == pytest.approx(o.score, abs=1e-12)
        # The top doc matches every query term exactly: perfect score 1.
        assert oracle[0].score == pytest.approx(1.0)


class TestSnapshotKeyTypes:
    def test_mixed_scalar_keys_round_trip(self, tmp_path):
        ix = Index(1)
        ix.add_document([_one], whitespace_tokenizer, 1, "alpha beta")
        ix.add_document([_one], whitespace_tokenizer, "docA", "beta gamma")
        path = str(tmp_path / "snap.npz")
        snapshot.save(ix, path)
        loaded = snapshot.load(path)
        keys = {r.key for r in loaded.query("beta", bm25.new(), whitespace_tokenizer, [1.0])}
        assert keys == {1, "docA"}
        assert 1 in loaded.docs and "docA" in loaded.docs

    def test_bool_keys_not_coerced(self, tmp_path):
        ix = Index(1)
        ix.add_document([_one], whitespace_tokenizer, True, "alpha")
        ix.add_document([_one], whitespace_tokenizer, 7, "alpha")
        path = str(tmp_path / "snap.npz")
        snapshot.save(ix, path)
        loaded = snapshot.load(path)
        keys = {r.key for r in loaded.query("alpha", bm25.new(), whitespace_tokenizer, [1.0])}
        assert keys == {True, 7}
        assert any(k is True for k in loaded.docs)


class TestSnapshotArchiveHygiene:
    def test_no_stray_allow_pickle_array(self, tmp_path):
        ix = Index(1)
        ix.add_document([_one], whitespace_tokenizer, 0, "a b")
        path = str(tmp_path / "snap.npz")
        snapshot.save(ix, path)
        with np.load(path, allow_pickle=True) as z:
            assert "allow_pickle" not in z.files

    def test_nul_in_term_round_trips(self, tmp_path):
        # The default tokenizer only splits on spaces, so NUL is a legal
        # term byte; a custom tokenizer can also emit arbitrary terms.
        ix = Index(1)
        ix.add_document([_one], whitespace_tokenizer, 0, "a\x00b plain")
        ix.add_document([_one], whitespace_tokenizer, 1, "plain")
        path = str(tmp_path / "snap.npz")
        snapshot.save(ix, path)
        loaded = snapshot.load(path)
        assert loaded.terms() == ix.terms()
        got = loaded.query("a\x00b", bm25.new(), whitespace_tokenizer, [1.0])
        want = ix.query("a\x00b", bm25.new(), whitespace_tokenizer, [1.0])
        assert [r.key for r in got] == [r.key for r in want] == [0]
        assert got[0].score == pytest.approx(want[0].score, abs=1e-12)


class TestBulkIntraBatchDuplicates:
    def test_last_occurrence_wins(self):
        ix = Index(1)
        ix.add_documents_columnar(["k", "k"], [["apple apple", "banana"]])

        seq = Index(1)
        seq.add_document([_one], whitespace_tokenizer, "k", "apple apple")
        seq.add_document([_one], whitespace_tokenizer, "k", "banana")

        assert len(ix.docs) == len(seq.docs) == 1
        assert ix.fields[0].sum == seq.fields[0].sum == 1
        assert ix.fields[0].avg == seq.fields[0].avg

        # The stale first doc must not be queryable...
        assert ix.query("apple", bm25.new(), whitespace_tokenizer, [1.0]) == []
        # ...but its term stays visible to expansion until vacuum (latent
        # deletion, matching sequential re-add semantics).
        assert ix.expand_term("app") == seq.expand_term("app") == ["apple"]
        got = ix.query("banana", bm25.new(), whitespace_tokenizer, [1.0])
        want = seq.query("banana", bm25.new(), whitespace_tokenizer, [1.0])
        assert [r.key for r in got] == [r.key for r in want] == ["k"]
        assert got[0].score == pytest.approx(want[0].score, abs=1e-12)
        assert ix.removed_keys == seq.removed_keys == {"k"}

        ix.vacuum()
        seq.vacuum()
        assert ix.expand_term("app") == seq.expand_term("app") == []
        assert ix.removed_keys == set()

    def test_duplicates_mixed_with_existing(self):
        ix = Index(1)
        ix.add_document([_one], whitespace_tokenizer, "a", "old")
        ix.add_documents_columnar(["a", "b", "a"], [["mid", "bee", "new"]])
        assert sorted(ix.docs) == ["a", "b"]
        assert ix.query("old", bm25.new(), whitespace_tokenizer, [1.0]) == []
        assert ix.query("mid", bm25.new(), whitespace_tokenizer, [1.0]) == []
        assert [r.key for r in ix.query("new", bm25.new(), whitespace_tokenizer, [1.0])] == ["a"]
        assert [r.key for r in ix.query("bee", bm25.new(), whitespace_tokenizer, [1.0])] == ["b"]


# --------------------------------------------------------------------- #
# Round-2 advisor findings                                               #
# --------------------------------------------------------------------- #


def _nul_tokenizer(s):
    return s.split("|")


class TestTrailingNulTermIdentity:
    """Fixed-width (<U) numpy interning strips trailing NULs; terms
    differing only by trailing NULs must keep distinct postings through
    segment merges, bulk ingest, and the device planner (escape_terms_fixed)."""

    def _index(self, config=None):
        ix = Index(1, config=config)
        ix.add_document([_one], _nul_tokenizer, 0, "a")
        ix.add_document([_one], _nul_tokenizer, 1, "a\x00")
        ix.add_document([_one], _nul_tokenizer, 2, "a|a\x00")
        return ix

    def test_merge_segments_keeps_nul_terms_distinct(self):
        from probly_search_tpu.config import IndexConfig
        from probly_search_tpu.index.segment import merge_segments

        # Force per-add flush + eager merge so merge_segments runs.
        cfg = IndexConfig(pending_flush_docs=1, max_segments=1)
        ix = self._index(cfg)
        ix._flush_pending()
        assert ix.terms() == ["a", "a\x00"]
        # Direct unit check too.
        merged = merge_segments(ix._segments, 1)
        assert merged.terms == ["a", "a\x00"]
        # "a" prefix-expands to both terms; "a\x00" matches only itself.
        ra = ix.query("a", bm25.new(), _nul_tokenizer, [1.0])
        rb = ix.query("a\x00", bm25.new(), _nul_tokenizer, [1.0])
        assert sorted(r.key for r in ra) == [0, 1, 2]
        assert sorted(r.key for r in rb) == [1, 2]

    def test_device_planner_matches_host_on_nul_terms(self):
        ix = self._index()
        for q in ("a", "a\x00", "a|a\x00"):
            host = ix.query(q, bm25.new(), _nul_tokenizer, [1.0])
            dev = ix.query_batch([q], bm25.new(), _nul_tokenizer, top_k=10)[0]
            assert [r.key for r in dev] == [r.key for r in host], repr(q)
            for h, d in zip(host, dev):
                assert abs(h.score - d.score) < 2e-5 * max(1.0, abs(h.score))

    def test_bulk_python_path_keeps_nul_terms_distinct(self):
        ix = Index(1)
        ix.add_documents_columnar([0, 1, 2], [["a", "a\x00", "a|a\x00"]],
                                  tokenizer=_nul_tokenizer)
        assert ix.terms() == ["a", "a\x00"]
        rb = ix.query("a\x00", bm25.new(), _nul_tokenizer, [1.0])
        assert sorted(r.key for r in rb) == [1, 2]

    def test_escape_round_trip_and_order(self):
        from probly_search_tpu.index.segment import (
            _escape_one,
            _unescape_one,
            escape_terms_fixed,
        )

        terms = ["a", "a\x00", "a\x00\x00", "a\x01", "a\x01\x01", "ab", "a\x00b"]
        for t in terms:
            assert _unescape_one(_escape_one(t)) == t
        esc = escape_terms_fixed(terms)
        # Order-preserving: sorting escaped == sorting raw.
        raw_sorted = sorted(terms)
        esc_sorted_unescaped = [_unescape_one(str(t)) for t in np.sort(esc)]
        assert esc_sorted_unescaped == raw_sorted
        # Lossless through the <U conversion.
        assert [_unescape_one(str(t)) for t in esc] == terms


class TestShardedDrainRegressions:
    def _mesh(self):
        import jax

        from probly_search_tpu.parallel import make_mesh

        return make_mesh(data=1, docs=4, devices=jax.devices()[:4])

    def test_empty_index_get_arrays(self):
        from probly_search_tpu.parallel import ShardedDeviceIndex

        ix = Index(1)
        sdix = ShardedDeviceIndex(ix, self._mesh())
        pending = sdix.query_batch_async(["alpha"], bm25.new())
        scores, slots, keys = pending.get_arrays()
        assert scores.shape == slots.shape
        assert not np.isfinite(scores).any()
        assert (slots == -1).all()
        assert pending.get() == [[]]

    def test_all_fallback_respects_top_k(self):
        from probly_search_tpu.config import IndexConfig
        from probly_search_tpu.parallel import ShardedDeviceIndex

        cfg = IndexConfig(max_query_terms=2)
        ix = Index(1, config=cfg)
        for i in range(4):
            ix.add_document([_one], whitespace_tokenizer, i, "x y z w")
        sdix = ShardedDeviceIndex(ix, self._mesh())
        # 3 terms > max_query_terms=2 -> whole batch is host fallback.
        pending = sdix.query_batch_async(["x y z"], bm25.new(), top_k=25)
        scores, slots, keys = pending.get_arrays()
        assert scores.shape == (1, 25)
        rows = pending.get()
        assert len(rows[0]) == 4
        host = ix.query("x y z", bm25.new(), whitespace_tokenizer, [1.0], top_k=25)
        assert [r.key for r in rows[0]] == [r.key for r in host]
