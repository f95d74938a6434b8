"""Shared test utilities — port of the reference's ``test_util``
(`/root/reference/src/lib.rs:16-84`)."""

from dataclasses import dataclass

from probly_search_tpu import Index, whitespace_tokenizer

tokenizer = whitespace_tokenizer


@dataclass
class Doc:
    id: int
    title: str
    text: str = ""


def title_extract(d: Doc):
    return [d.title]


def text_extract(d: Doc):
    return [d.text]


def approx_equal(a: float, b: float, dp: int = 8) -> bool:
    """`approx_equal` (lib.rs:22-26)."""
    return abs(a - b) < 10.0 ** (-dp)


def build_test_index(titles) -> Index:
    """`build_test_index` (lib.rs:72-83): single title field, ids from 0."""
    index = Index(1)
    for i, title in enumerate(titles):
        doc = Doc(id=i, title=title)
        index.add_document([title_extract], tokenizer, doc.id, doc)
    return index


def check_score(index: Index, scorer, query: str, expected):
    """`test_score` (lib.rs:46-66): run the query with unit boosts, sort by
    (score desc, key asc), assert result set equality to 8 decimal places."""
    results = index.query(query, scorer, tokenizer, [1.0] * index.num_fields)
    results.sort(key=lambda r: (-r.score, r.key))
    assert len(results) == len(expected), (
        f"expected {len(expected)} results, got {len(results)}: {results}"
    )
    for (exp_key, exp_score), result in zip(expected, results):
        assert result.key == exp_key, f"expected key {exp_key}, got {result.key}"
        assert approx_equal(exp_score, result.score, 8), (
            f"key {exp_key}: expected score {exp_score!r}, got {result.score!r}"
        )
