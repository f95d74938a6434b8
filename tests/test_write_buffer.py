"""The sequential write buffer must be observably identical to eager adds.

``add_document`` defers tokenize/count/pack/stats to ``_flush_pending``
(index/core.py); every reader flushes first.  The eager baseline here is the
same engine with ``pending_flush_docs = 1`` (flush after every add), which
pins the reference's per-add bookkeeping (index.rs:77-158) through the
existing golden tests.  Also covers the native multi-field CSR pass
(psearch_tokenize_csr_multi / psearch_intern_csr_multi) against the numpy
fallback.
"""

import math

import numpy as np

from probly_search_tpu import Index, bm25, whitespace_tokenizer, zero_to_one
from .util import tokenizer as custom_tokenizer


def _eager(F):
    ix = Index(F)
    ix.config.pending_flush_docs = 1
    return ix


def _acc(F):
    return [(lambda f: (lambda d: [d[f]]))(f) for f in range(F)]


def _assert_same(a: Index, b: Index, queries, tok):
    assert a.terms() == b.terms()
    for t in a.terms():
        assert a.document_frequency(t) == b.document_frequency(t), t
    for f in range(a.num_fields):
        assert a.fields[f].sum == b.fields[f].sum
        av, bv = a.fields[f].avg, b.fields[f].avg
        assert (math.isnan(av) and math.isnan(bv)) or av == bv
    for q in queries:
        for scorer_mod in (bm25, zero_to_one):
            ra = a.query(q, scorer_mod.new(), tok, [1.0] * a.num_fields)
            rb = b.query(q, scorer_mod.new(), tok, [1.0] * b.num_fields)
            assert [(r.key, r.score) for r in ra] == [(r.key, r.score) for r in rb], q


def test_interleaved_add_remove_readd_matches_eager():
    texts = ["a b", "b c c", "a", "", "c a b", "b"]
    deferred, eager = Index(1), _eager(1)
    for ix in (deferred, eager):
        acc = _acc(1)
        for i, t in enumerate(texts):
            ix.add_document(acc, whitespace_tokenizer, i, [t])
        ix.remove_document(2)
        ix.add_document(acc, whitespace_tokenizer, 1, ["c c d"])  # re-add
        ix.remove_document(5)
        ix.add_document(acc, whitespace_tokenizer, 9, ["d a"])
    _assert_same(deferred, eager, ["a", "b", "c", "d", "a b"], whitespace_tokenizer)
    assert deferred.removed_keys == eager.removed_keys


def test_stats_observed_mid_stream_match_eager():
    deferred, eager = Index(2), _eager(2)
    acc = _acc(2)
    rows = [["a b", "x"], ["b", "x y z"], ["", "y"]]
    for i, row in enumerate(rows):
        for ix in (deferred, eager):
            ix.add_document(acc, whitespace_tokenizer, i, row)
        # Observing stats between adds must flush the buffer.
        for f in range(2):
            assert deferred.fields[f].sum == eager.fields[f].sum
            assert deferred.fields[f].avg == eager.fields[f].avg
        assert set(deferred.docs) == set(eager.docs)
        for k in deferred.docs:
            assert np.array_equal(
                deferred.docs[k].field_length, eager.docs[k].field_length
            )


def test_remove_last_doc_sets_ieee_stats():
    ix = Index(1)
    ix.add_document(_acc(1), whitespace_tokenizer, "k", ["a b c"])
    ix.remove_document("k")
    assert ix.fields[0].sum == 0
    assert math.isnan(ix.fields[0].avg)


def test_remove_while_buffer_nonempty_is_exact():
    # Eager remove of a MATERIALIZED doc while other adds sit in the buffer:
    # the next flush recomputes avg from the final sum (commutativity).
    deferred, eager = Index(1), _eager(1)
    acc = _acc(1)
    for ix in (deferred, eager):
        ix.add_document(acc, whitespace_tokenizer, 0, ["a a b"])
    # materialize doc 0 in the deferred index
    _ = deferred.fields[0].sum
    for ix in (deferred, eager):
        ix.add_document(acc, whitespace_tokenizer, 1, ["c"])
        ix.remove_document(0)
        ix.add_document(acc, whitespace_tokenizer, 2, ["b c"])
    _assert_same(deferred, eager, ["a", "b", "c"], whitespace_tokenizer)


def test_mixed_tokenizers_in_one_buffer():
    def upper_tok(s):
        return [t.upper() for t in s.split(" ")]

    deferred, eager = Index(1), _eager(1)
    acc = _acc(1)
    for ix in (deferred, eager):
        ix.add_document(acc, whitespace_tokenizer, 0, ["a b"])
        ix.add_document(acc, upper_tok, 1, ["a b"])
        ix.add_document(acc, whitespace_tokenizer, 2, ["b"])
    _assert_same(deferred, eager, ["a", "A", "b", "B"], whitespace_tokenizer)


def test_multi_value_and_empty_values_deferred():
    deferred, eager = Index(1), _eager(1)

    def acc_multi(d):
        return d

    for ix in (deferred, eager):
        ix.add_document([acc_multi], whitespace_tokenizer, 0, ["a b", "c"])
        ix.add_document([acc_multi], whitespace_tokenizer, 1, [])
        ix.add_document([acc_multi], whitespace_tokenizer, 2, ["b", ""])
    _assert_same(deferred, eager, ["a", "b", "c"], whitespace_tokenizer)
    # field_length = LAST value's count (index.rs:112-114)
    assert int(deferred.docs[0].field_length[0]) == 1
    assert int(deferred.docs[2].field_length[0]) == 0


def test_duplicate_key_within_buffer_flushes_and_replaces():
    ix = Index(1)
    acc = _acc(1)
    ix.add_document(acc, whitespace_tokenizer, "k", ["a"])
    ix.add_document(acc, whitespace_tokenizer, "k", ["b"])  # buffered dup
    res = ix.query("b", bm25.new(), whitespace_tokenizer, [1.0])
    assert [r.key for r in res] == ["k"]
    assert ix.query("a", bm25.new(), whitespace_tokenizer, [1.0]) == []
    assert "k" in ix.removed_keys


class TestNativeMultiCsr:
    def _cols(self, F=2, n=60, seed=11):
        import random

        rng = random.Random(seed)
        vocab = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 3))) for _ in range(30)]
        return [
            [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 5))) for _ in range(n)]
            for _ in range(F)
        ]

    def test_two_field_default_tokenizer_native_vs_fallback(self, monkeypatch):
        cols = self._cols()
        nat = Index(2)
        nat.add_documents_columnar(list(range(60)), cols)

        with monkeypatch.context() as m:
            import probly_search_tpu.native.build as nb

            m.setattr(nb, "_lib", None)
            m.setattr(nb, "_failed", True)  # force the numpy fallback
            fb = Index(2)
            fb.add_documents_columnar(list(range(60)), cols)
        _assert_same(nat, fb, ["a", "ab", "b c", "d"], whitespace_tokenizer)

    def test_custom_tokenizer_through_intern_path(self, monkeypatch):
        cols = self._cols(F=2)
        nat = Index(2)
        nat.add_documents_columnar(list(range(60)), cols, tokenizer=custom_tokenizer)
        with monkeypatch.context() as m:
            import probly_search_tpu.native.build as nb

            m.setattr(nb, "_lib", None)
            m.setattr(nb, "_failed", True)
            fb = Index(2)
            fb.add_documents_columnar(list(range(60)), cols, tokenizer=custom_tokenizer)
        _assert_same(nat, fb, ["a", "ab", "b c", "d"], custom_tokenizer)

    def test_nul_and_space_edge_terms(self):
        # Terms containing NUL bytes force the safe per-term decode path.
        cols = [["a\x00b c", "c a\x00b", ""]]
        nat = Index(1)
        nat.add_documents_columnar([0, 1, 2], cols)
        seq = _eager(1)
        for i, t in enumerate(cols[0]):
            seq.add_document(_acc(1), whitespace_tokenizer, i, [t])
        _assert_same(nat, seq, ["a\x00b", "c"], whitespace_tokenizer)

    def test_multi_value_cells_native(self):
        cols = [[["a b", "c"], "b", ["", "a"]], ["x", ["y", "z z"], "x y"]]
        nat = Index(2)
        nat.add_documents_columnar([0, 1, 2], cols)
        seq = _eager(2)

        def acc0(d):
            c = d[0]
            return [c] if isinstance(c, str) else c

        def acc1(d):
            c = d[1]
            return [c] if isinstance(c, str) else c

        for i in range(3):
            seq.add_document([acc0, acc1], whitespace_tokenizer, i, [cols[0][i], cols[1][i]])
        _assert_same(nat, seq, ["a", "b", "c", "x", "y", "z"], whitespace_tokenizer)
