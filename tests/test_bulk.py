"""Bulk columnar ingestion must be observably identical to sequential
``add_document`` calls (end state): same terms, postings, field stats, and
query results for both scorers."""

import random


from probly_search_tpu import Index, bm25, zero_to_one
from .util import tokenizer


def _rand_corpus(n, seed=0, fields=1):
    rng = random.Random(seed)
    vocab = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 4))) for _ in range(50)]
    cols = [
        [" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6))) for _ in range(n)]
        for _ in range(fields)
    ]
    return cols


def _sequential_index(cols):
    F = len(cols)
    ix = Index(F)
    accessors = [
        (lambda f: (lambda d: [d[f]]))(f) for f in range(F)
    ]
    for i in range(len(cols[0])):
        ix.add_document(accessors, tokenizer, i, [cols[f][i] for f in range(F)])
    return ix


def _bulk_index(cols):
    F = len(cols)
    ix = Index(F)
    ix.add_documents_columnar(list(range(len(cols[0]))), cols)
    return ix


def _assert_same(a: Index, b: Index, queries):
    assert a.terms() == b.terms()
    for t in a.terms():
        assert a.document_frequency(t) == b.document_frequency(t), t
    for f in range(a.num_fields):
        assert a.fields[f].sum == b.fields[f].sum
        assert abs(a.fields[f].avg - b.fields[f].avg) < 1e-12
    for q in queries:
        for scorer_mod in (bm25, zero_to_one):
            ra = a.query(q, scorer_mod.new(), tokenizer, [1.0] * a.num_fields)
            rb = b.query(q, scorer_mod.new(), tokenizer, [1.0] * b.num_fields)
            assert [(r.key, r.score) for r in ra] == [(r.key, r.score) for r in rb], q


def test_bulk_matches_sequential_single_field():
    cols = _rand_corpus(120, seed=3)
    _assert_same(_sequential_index(cols), _bulk_index(cols), ["a", "ab", "abc", "b c", "f"])


def test_bulk_matches_sequential_two_fields():
    cols = _rand_corpus(80, seed=7, fields=2)
    _assert_same(_sequential_index(cols), _bulk_index(cols), ["a", "b", "c d", "e"])


def test_bulk_into_existing_index_and_lifecycle():
    cols = _rand_corpus(50, seed=11)
    ix = _bulk_index(cols)
    # Mix in sequential ops after a bulk load.
    ix.add_document([lambda d: [d]], tokenizer, 1000, "zz zy")
    ix.remove_document(3)
    r = ix.query("zz", bm25.new(), tokenizer, [1.0])
    assert r and r[0].key == 1000
    ix.vacuum()
    assert 3 not in ix.docs
    # Bulk re-add of an existing key replaces it.
    ix.add_documents_columnar([1000], [["qq"]])
    assert ix.document_frequency("zz") == 0
    assert ix.document_frequency("qq") == 1


def test_bulk_empty_docs_and_empty_batch():
    ix = Index(1)
    ix.add_documents_columnar([], [[]])
    assert len(ix.docs) == 0
    ix.add_documents_columnar([0, 1], [["", "a a  b"]])
    assert len(ix.docs) == 2
    assert list(ix.docs[0].field_length) == [0]
    assert list(ix.docs[1].field_length) == [3]
    assert ix.document_frequency("a") == 2


def test_bulk_native_tokenizer_nul_in_term():
    """A term legally CONTAINING a NUL byte (the tokenizer only splits on
    spaces) must survive the native tokenize+intern path — the term blob is
    NUL-separated, so reconstruction must slice by byte lengths, not split.
    """
    from probly_search_tpu import Index, bm25, whitespace_tokenizer

    texts = ["a\x00b plain", "plain zz", "a\x00b a\x00b"]
    bulk = Index(1)
    bulk.add_documents_columnar([0, 1, 2], [texts])
    seq = Index(1)
    for i, t in enumerate(texts):
        seq.add_document([lambda d: [d]], whitespace_tokenizer, i, t)

    for q in ["a\x00b", "plain", "a"]:
        got = bulk.query(q, bm25.new(), whitespace_tokenizer, [1.0])
        want = seq.query(q, bm25.new(), whitespace_tokenizer, [1.0])
        assert [(r.key, round(r.score, 10)) for r in got] == [
            (r.key, round(r.score, 10)) for r in want
        ], q
    assert bulk.expand_term("a") == seq.expand_term("a")


class TestBulkMultiValueFields:
    """Multi-valued field cells (the Vec<&str> accessor shape,
    index.rs:90-96) must reproduce sequential add_document end-state,
    including the last-value field_length quirk (index.rs:112-114)."""

    def test_multi_value_matches_sequential(self):
        from probly_search_tpu import Index, bm25, whitespace_tokenizer

        cells = [
            ["red apple", "green pear plum"],
            "single value here",
            ["one"],
            [],
            ["alpha beta", "gamma", "alpha delta eps"],
        ]
        body = ["b0 red", "b1", "b2 one", "b3", "b4 gamma"]

        bulk = Index(2)
        bulk.add_documents_columnar(list(range(5)), [cells, body])

        seq = Index(2)
        for i in range(5):
            vals = cells[i] if not isinstance(cells[i], str) else [cells[i]]
            seq.add_document(
                [lambda d, v=vals: v, lambda d, i=i: [body[i]]],
                whitespace_tokenizer,
                i,
                None,
            )

        assert bulk.fields[0].sum == seq.fields[0].sum
        assert bulk.fields[0].avg == seq.fields[0].avg
        assert bulk.fields[1].sum == seq.fields[1].sum
        for k in range(5):
            assert list(bulk.docs[k].field_length) == list(seq.docs[k].field_length)
        assert bulk.terms() == seq.terms()
        for q in ("alpha", "red", "gamma", "one", "b4"):
            got = bulk.query(q, bm25.new(), whitespace_tokenizer, [1.0, 1.0])
            want = seq.query(q, bm25.new(), whitespace_tokenizer, [1.0, 1.0])
            assert [(r.key, round(r.score, 10)) for r in got] == [
                (r.key, round(r.score, 10)) for r in want
            ], q

    def test_multi_value_duplicate_keys(self):
        from probly_search_tpu import Index, bm25, whitespace_tokenizer

        bulk = Index(1)
        bulk.add_documents_columnar(
            ["k", "k"], [[["old one two", "old three"], ["new single"]]]
        )
        seq = Index(1)
        seq.add_document(
            [lambda d: ["old one two", "old three"]], whitespace_tokenizer, "k", None
        )
        seq.add_document([lambda d: ["new single"]], whitespace_tokenizer, "k", None)
        assert bulk.fields[0].sum == seq.fields[0].sum
        assert bulk.fields[0].avg == seq.fields[0].avg
        got = bulk.query("new", bm25.new(), whitespace_tokenizer, [1.0])
        want = seq.query("new", bm25.new(), whitespace_tokenizer, [1.0])
        assert [(r.key, round(r.score, 10)) for r in got] == [
            (r.key, round(r.score, 10)) for r in want
        ]
