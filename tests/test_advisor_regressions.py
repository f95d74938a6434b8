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
