"""BM25 golden tests.

Every golden value is imported verbatim from the reference:
`/root/reference/src/score/default/bm25.rs:96-137`,
`/root/reference/src/query.rs:166-338`,
`/root/reference/tests/integrations_tests.rs:27-93`, and
`/root/reference/tests/document_frequency.rs`.
"""

from dataclasses import dataclass


from probly_search_tpu import Index, bm25
from .util import (
    Doc,
    approx_equal,
    build_test_index,
    check_score,
    text_extract,
    title_extract,
    tokenizer,
)


# --- bm25.rs unit goldens (bm25.rs:104-136) --------------------------------


def test_it_should_return_doc_1():
    x = build_test_index(["a b c", "c d e"])
    check_score(x, bm25.new(), "a", [(0, 0.6931471805599453)])


def test_it_should_return_doc_1_and_2():
    x = build_test_index(["a b c", "c d e"])
    check_score(
        x,
        bm25.new(),
        "c",
        [(0, 0.1823215567939546), (1, 0.1823215567939546)],
    )


# --- query.rs goldens (query.rs:181-338): 2-field docs ---------------------


def _two_field_index():
    index = Index(2)
    docs = [
        Doc(id=1, title="a b c", text="hello world"),
        Doc(id=2, title="c d e", text="lorem ipsum"),
    ]
    for doc in docs:
        index.add_document([title_extract, text_extract], tokenizer, doc.id, doc)
    return index


def test_query_returns_doc_1():
    index = _two_field_index()
    result = index.query("a", bm25.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 1
    assert approx_equal(result[0].score, 0.6931471805599453)
    assert result[0].key == 1


def test_query_returns_doc_1_and_2():
    index = _two_field_index()
    result = index.query("c", bm25.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 2
    assert approx_equal(result[0].score, 0.1823215567939546)
    assert approx_equal(result[1].score, 0.1823215567939546)
    assert {result[0].key, result[1].key} == {1, 2}


def test_query_matches_text_by_expanding():
    index = _two_field_index()
    result = index.query("h", bm25.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 1
    assert approx_equal(result[0].score, 0.12637567304702957)
    assert result[0].key == 1


def test_token_separator_is_disjunction_operator():
    index = _two_field_index()
    result = index.query("a d", bm25.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 2
    assert approx_equal(result[0].score, 0.6931471805599453)
    assert approx_equal(result[1].score, 0.6931471805599453)
    assert {result[0].key, result[1].key} == {1, 2}


# --- expansion membership (query.rs:340-388) --------------------------------


def test_expand_term_expands_all():
    index = Index(2)
    docs = [
        Doc(id=1, title="abc", text="hello world"),
        Doc(id=2, title="adef", text="lorem ipsum"),
    ]
    for doc in docs:
        index.add_document([title_extract, text_extract], tokenizer, doc.id, doc)
    # Reference returns reverse-insertion order ["adef", "abc"]; only
    # membership is contractual — this engine returns lexicographic order.
    assert set(index.expand_term("a")) == {"abc", "adef"}


def test_expand_term_no_match():
    index = Index(2)
    docs = [
        Doc(id=1, title="abc def", text="hello world"),
        Doc(id=2, title="adef abc", text="lorem ipsum"),
    ]
    for doc in docs:
        index.add_document([title_extract, text_extract], tokenizer, doc.id, doc)
    assert index.expand_term("x") == []


# --- integration lifecycle (integrations_tests.rs:27-93) --------------------


@dataclass
class LifecycleDoc:
    id: int
    title: str
    description: str


def _lc_title(d):
    return [d.title]


def _lc_description(d):
    return [d.description]


def test_add_query_delete_bm25():
    index = Index(2)
    doc_1 = LifecycleDoc(id=0, title="abc", description="dfg")
    doc_2 = LifecycleDoc(id=1, title="dfgh", description="abcd")
    index.add_document([_lc_title, _lc_description], tokenizer, doc_1.id, doc_1)
    index.add_document([_lc_title, _lc_description], tokenizer, doc_2.id, doc_2)

    result = index.query("abc", bm25.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 2
    assert result[0].key == 0
    assert approx_equal(result[0].score, 0.6931471805599453)
    assert result[1].key == 1
    assert approx_equal(result[1].score, 0.28104699650060755)

    index.remove_document(doc_1.id)
    index.vacuum()

    result = index.query("abc", bm25.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 1
    assert result[0].key == 1
    assert approx_equal(result[0].score, 0.1166450426074421)


# --- df > N regression (document_frequency.rs) ------------------------------


def test_df_greater_than_documents_len_does_not_fail():
    @dataclass
    class ContentDoc:
        id: int
        content: str

    def content_extract(d):
        return [d.content]

    index = Index(1)
    doc = ContentDoc(id=0, content="this is text with lots of the, the, the, the")
    index.add_document([content_extract], tokenizer, doc.id, doc)
    # Must not raise (reference guards with the min(N, df) clamp, bm25.rs:41).
    index.query("What did the author do growing up?", bm25.new(), tokenizer, [1.0])


def test_df_counts_occurrences_like_reference_pointers():
    # df = number of live posting pointers = total occurrences (index.rs:119).
    x = build_test_index(["the the the", "the cat"])
    assert x.document_frequency("the") == 4
    assert x.document_frequency("cat") == 1
    assert x.document_frequency("dog") == 0
