"""Edge cases and error paths."""

import numpy as np
import pytest

from probly_search_tpu import Index, IndexConfig, bm25, zero_to_one
from .util import Doc, build_test_index, title_extract, tokenizer


def test_zero_field_index():
    ix = Index(0)
    ix.add_document([], tokenizer, 1, object())
    assert len(ix.docs) == 1
    assert ix.query("anything", bm25.new(), tokenizer, []) == []


def test_negative_fields_raises():
    with pytest.raises(ValueError):
        Index(-1)


def test_max_query_terms_enforced_on_device():
    cfg = IndexConfig(max_query_terms=2)
    ix = Index(1, config=cfg)
    ix.add_document([title_extract], tokenizer, 0, Doc(id=0, title="a b c"))
    with pytest.raises(ValueError, match="max_query_terms"):
        ix.query_batch(["a b c"], bm25.new(), top_k=3, backend="device")
    # Host path has no cap (reference parity).
    assert len(ix.query("a b c", bm25.new(), tokenizer, [1.0])) == 1


def test_max_expansions_enforced_on_device():
    cfg = IndexConfig(max_expansions=2)
    ix = Index(1, config=cfg)
    for i, t in enumerate(["aa", "ab", "ac", "ad"]):
        ix.add_document([title_extract], tokenizer, i, Doc(id=i, title=t))
    with pytest.raises(ValueError, match="max_expansions"):
        ix.query_batch(["a"], bm25.new(), top_k=3, backend="device")
    assert len(ix.query("a", bm25.new(), tokenizer, [1.0])) == 4


def test_unicode_terms_and_prefixes():
    ix = build_test_index(["smörgåsbord café", "smör", "日本語 テスト"])
    r = ix.query("smö", bm25.new(), tokenizer, [1.0])
    assert {x.key for x in r} == {0, 1}
    r = ix.query("日本", bm25.new(), tokenizer, [1.0])
    assert [x.key for x in r] == [2]
    # byte-length expansion boost: exact match scores higher than expansion
    r = ix.query("smör", bm25.new(), tokenizer, [1.0])
    assert r[0].key == 1


def test_custom_tokenizer_device_path():
    def comma_tok(s):
        return s.split(",")

    ix = Index(1)
    ix.add_document([title_extract], comma_tok, 0, Doc(id=0, title="red,green blue"))
    assert ix.terms() == ["green blue", "red"]
    rows = ix.query_batch(["red", "green blue"], bm25.new(), tokenizer=comma_tok, top_k=3)
    assert rows[0][0].key == 0 and rows[1][0].key == 0


def test_boost_zero_field():
    from .util import text_extract

    ix = Index(2)
    ix.add_document([title_extract, text_extract], tokenizer, 0, Doc(id=0, title="x", text="y"))
    r = ix.query("y", bm25.new(), tokenizer, [1.0, 0.0])
    # zero boost -> zero score -> excluded (bm25.rs:89-92)
    assert r == []


def test_very_long_document():
    ix = Index(1)
    ix.add_document([title_extract], tokenizer, 0, Doc(id=0, title="w " * 5000 + "zlast"))
    assert ix.document_frequency("w") == 5000
    r = ix.query("zlast", bm25.new(), tokenizer, [1.0])
    assert r[0].key == 0


def test_query_all_results_vs_topk_consistency():
    ix = build_test_index([f"shared u{i}" for i in range(40)])
    full = ix.query("shared", bm25.new(), tokenizer, [1.0])
    topk = ix.query("shared", bm25.new(), tokenizer, [1.0], top_k=10)
    assert [r.key for r in topk] == [r.key for r in full[:10]]


def test_stateful_scorer_reuse_across_queries():
    # zero_to_one clears state between queries (zero_to_one.rs:125).
    ix = build_test_index(["abc", "abd"])
    scorer = zero_to_one.new()
    r1 = ix.query("abc", scorer, tokenizer, [1.0])
    r2 = ix.query("abc", scorer, tokenizer, [1.0])
    assert [(r.key, r.score) for r in r1] == [(r.key, r.score) for r in r2]
