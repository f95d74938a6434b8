"""Vectorized zero-to-one execution must be bit-identical to the exact
per-posting oracle (same f64 ops, same enumeration order)."""

import random

from probly_search_tpu import Index, zero_to_one
from probly_search_tpu.models.zero_to_one import vectorized_query
from .util import Doc, build_test_index, title_extract, tokenizer


def _check(ix, queries):
    for q in queries:
        oracle = ix.query(q, zero_to_one.new(), tokenizer, [1.0] * ix.num_fields)
        fast = vectorized_query(ix, q, tokenizer)
        assert [(r.key, r.score) for r in fast] == [(r.key, r.score) for r in oracle], q


def test_golden_corpora():
    _check(build_test_index(["abc", "abcefg", "abcefghij"]), ["abc", "ab", "a"])
    _check(build_test_index(["abcdef abcdefghi"]), ["abc abc", "abc"])
    _check(build_test_index(["abc abc"]), ["abc", "abc ab", "abc abc"])
    _check(build_test_index(["oy oy oysters"]), ["oy oy oysters", "oy"])
    _check(
        build_test_index(
            ["abcdef", "abc abcdef", "abcdef abcdef", "abcdef abcdefghi", "def abcdef"]
        ),
        ["abc", "abc abc", "def", "a d"],
    )


def test_multifield():
    ix = Index(2)
    titles = ["abc", "abcefg", "abcefghij"]
    descs = ["abc", "a", "zz"]
    for i, (t, d) in enumerate(zip(titles, descs)):
        ix.add_document(
            [lambda doc: [doc[0]], lambda doc: [doc[1]]], tokenizer, i, (t, d)
        )
    _check(ix, ["abc", "a", "zz abc"])


def test_random_corpus_and_deletes():
    rng = random.Random(17)
    vocab = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 5))) for _ in range(40)]
    ix = Index(1)
    for i in range(150):
        ix.add_document(
            [title_extract], tokenizer, i,
            Doc(id=i, title=" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 7)))),
        )
    for i in range(30, 50):
        ix.remove_document(i)
    queries = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3))) for _ in range(25)]
    queries += [v[:1] for v in vocab[:5]] + ["", "  "]
    _check(ix, queries)


def test_query_batch_dispatches_vectorized():
    ix = build_test_index(["abc", "abcefg", "abcefghij"])
    rows = ix.query_batch(["abc", "ab"], zero_to_one.new(), top_k=2)
    oracle = ix.query("abc", zero_to_one.new(), tokenizer, [1.0])[:2]
    assert [(r.key, r.score) for r in rows[0]] == [(r.key, r.score) for r in oracle]
