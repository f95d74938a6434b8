"""Zero-to-one golden tests.

All golden values ported verbatim from
`/root/reference/src/score/default/zero_to_one.rs:129-405` and
`/root/reference/tests/integrations_tests.rs:95-149`.
"""

from dataclasses import dataclass

from probly_search_tpu import Index, zero_to_one
from .util import approx_equal, build_test_index, check_score, tokenizer


def test_it_should_perform_partial_matching():
    x = build_test_index(["abc", "abcefg", "abcefghij"])
    check_score(
        x,
        zero_to_one.new(),
        "abc",
        [(0, 1.0), (1, 0.5), (2, 0.33333333333333337)],
    )


def test_it_should_perform_partial_matching_repeating():
    x = build_test_index(["abcdef abcdefghi"])
    check_score(x, zero_to_one.new(), "abc abc", [(0, 0.4166666666666667)])


def test_it_should_penalize_repeating_query_terms():
    x = build_test_index(["abc"])
    check_score(x, zero_to_one.new(), "abc abc", [(0, 0.5)])


def test_it_should_penalize_missing_repeating_query_terms():
    x = build_test_index(["abc abc"])
    check_score(x, zero_to_one.new(), "abc", [(0, 0.5)])


def test_it_should_be_bounded_by_one():
    x = build_test_index(["abc abc"])
    check_score(x, zero_to_one.new(), "abc ab", [(0, 0.8333333333333334)])


def test_it_should_be_bounded_by_one_2():
    x = build_test_index(["abc ab"])
    check_score(x, zero_to_one.new(), "abc abc", [(0, 0.5)])


def test_it_should_be_bounded_be_one():
    x = build_test_index(["oy oy oysters"])
    check_score(x, zero_to_one.new(), "oy oy oysters", [(0, 1.0)])


def test_it_should_retrieve_multiple_results():
    x = build_test_index(
        ["abcdef", "abc abcdef", "abcdef abcdef", "abcdef abcdefghi", "def abcdef"]
    )
    check_score(
        x,
        zero_to_one.new(),
        "abc",
        [(0, 0.5), (1, 0.5), (2, 0.25), (3, 0.25), (4, 0.25)],
    )


def test_it_should_retrieve_multiple_results_and_penalize_repeating_query_terms():
    x = build_test_index(
        ["abcdef", "abc abcdef", "abcdef abcdef", "abcdef abcdefghi", "def abcdef"]
    )
    check_score(
        x,
        zero_to_one.new(),
        "abc abc",
        [(1, 0.75), (2, 0.5), (3, 0.4166666666666667), (0, 0.25), (4, 0.25)],
    )


@dataclass
class DocTitleDescription:
    id: int
    title: str
    description: str


def _title_extract(d):
    return [d.title]


def _description_extract(d):
    return [d.description]


def test_it_combines_multi_field_result():
    x = Index(2)
    titles = ["abc", "abcefg", "abcefghij"]
    descriptions = ["abc", "abcefg", "abcefghij"]
    for i, (title, description) in enumerate(zip(titles, descriptions)):
        doc = DocTitleDescription(id=i, title=title, description=description)
        x.add_document([_title_extract, _description_extract], tokenizer, doc.id, doc)
    check_score(
        x,
        zero_to_one.new(),
        "abc",
        [(0, 1.0), (1, 0.5), (2, 0.33333333333333337)],
    )


def test_it_combines_multi_field_result_by_ignoring_lowest():
    x = Index(2)
    titles = ["abc", "abcefg", "abcefghij"]
    descriptions = ["a", "a", "a"]
    for i, (title, description) in enumerate(zip(titles, descriptions)):
        doc = DocTitleDescription(id=i, title=title, description=description)
        x.add_document([_title_extract, _description_extract], tokenizer, doc.id, doc)
    check_score(
        x,
        zero_to_one.new(),
        "abc",
        [(0, 1.0), (1, 0.5), (2, 0.33333333333333337)],
    )


# --- integration lifecycle (integrations_tests.rs:95-149) -------------------


def test_add_query_delete_zero_to_one():
    index = Index(2)
    doc_1 = DocTitleDescription(id=0, title="abc", description="dfg")
    doc_2 = DocTitleDescription(id=1, title="dfgh", description="abcd")
    index.add_document([_title_extract, _description_extract], tokenizer, doc_1.id, doc_1)
    index.add_document([_title_extract, _description_extract], tokenizer, doc_2.id, doc_2)

    result = index.query("abc", zero_to_one.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 2
    assert result[0].key == 0 and result[0].score == 1.0
    assert result[1].key == 1 and result[1].score == 0.75

    # Latent removal: query again WITHOUT vacuum — removed doc must be
    # invisible (integrations_tests.rs:137-148).
    index.remove_document(doc_1.id)
    result = index.query("abc", zero_to_one.new(), tokenizer, [1.0, 1.0])
    assert len(result) == 1
    assert result[0].key == 1
    assert approx_equal(result[0].score, 0.75)
