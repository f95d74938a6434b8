"""Edge cases and error paths."""

import random

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


def test_max_query_terms_degrades_to_host_path():
    """Cap-exceeding queries fall back per-query to the exact host path
    (graceful degradation): same results as the host oracle, other queries
    in the batch still run on device, and the fallback is counted."""
    from probly_search_tpu.utils.metrics import metrics

    cfg = IndexConfig(max_query_terms=2)
    ix = Index(1, config=cfg)
    ix.add_document([title_extract], tokenizer, 0, Doc(id=0, title="a b c"))
    ix.add_document([title_extract], tokenizer, 1, Doc(id=1, title="a z"))
    before = metrics.snapshot()["counters"].get("device_fallback_queries", 0)
    rows = ix.query_batch(["a b c", "z"], bm25.new(), top_k=3, backend="device")
    oracle0 = ix.query("a b c", bm25.new(), tokenizer, [1.0], top_k=3)
    oracle1 = ix.query("z", bm25.new(), tokenizer, [1.0], top_k=3)
    assert [r.key for r in rows[0]] == [r.key for r in oracle0]
    assert rows[0][0].score == pytest.approx(oracle0[0].score, abs=1e-9)  # exact host path
    assert [r.key for r in rows[1]] == [r.key for r in oracle1]
    after = metrics.snapshot()["counters"]["device_fallback_queries"]
    assert after == before + 1


def test_max_expansions_degrades_to_host_path():
    cfg = IndexConfig(max_expansions=2)
    ix = Index(1, config=cfg)
    for i, t in enumerate(["aa", "ab", "ac", "ad"]):
        ix.add_document([title_extract], tokenizer, i, Doc(id=i, title=t))
    rows = ix.query_batch(["a", "ab"], bm25.new(), top_k=10, backend="device")
    oracle = ix.query("a", bm25.new(), tokenizer, [1.0], top_k=10)
    assert [r.key for r in rows[0]] == [r.key for r in oracle]
    assert len(rows[0]) == 4
    assert rows[1][0].key == 1  # in-cap query still served (by the device)


def test_many_df_groups_run_on_device():
    # 16 terms x 20 unique expansions = 320 distinct (term, expansion)
    # groups in one query.  df/idf are premultiplied on host into per-job
    # scales, so there is no device-side group cap: the whole query runs on
    # the device path (no fallback) with oracle-identical results.
    from probly_search_tpu.utils.metrics import metrics

    cfg = IndexConfig(max_expansions=64, max_query_terms=16)
    ix = Index(1, config=cfg)
    kid = 0
    prefixes = [f"p{i:02d}" for i in range(16)]
    for p in prefixes:
        for j in range(20):
            ix.add_document([title_extract], tokenizer, kid, Doc(id=kid, title=f"{p}x{j:02d}"))
            kid += 1
    query = " ".join(prefixes)
    before = metrics.snapshot()["counters"].get("device_fallback_queries", 0)
    rows = ix.query_batch([query], bm25.new(), top_k=5, backend="device")
    oracle = ix.query(query, bm25.new(), tokenizer, [1.0], top_k=5)
    assert [r.key for r in rows[0]] == [r.key for r in oracle]
    for h, d in zip(oracle, rows[0]):
        assert abs(h.score - d.score) < 2e-5 * max(1.0, abs(h.score))
    after = metrics.snapshot()["counters"].get("device_fallback_queries", 0)
    assert after == before  # served on device, no fallback


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


def test_doc_slot_capacity_degrades_and_shards(monkeypatch):
    """Past the single-chip merge-key capacity (2^27 doc slots) the device
    snapshot refuses with advice to shard; auto backend degrades to the
    host path, and the sharded index (whose capacity is per shard) still
    serves the corpus — the advice is an actual workflow."""
    import jax

    from probly_search_tpu.parallel import ShardedDeviceIndex, make_mesh

    ix = Index(1)
    for i in range(8):
        ix.add_document([title_extract], tokenizer, i, Doc(id=i, title=f"t{i} common"))
    ix._flush_pending()
    monkeypatch.setattr(ix, "_next_slot", 1 << 28)  # pretend 268M doc slots

    with pytest.raises(ValueError, match="shard the index"):
        ix.device_index()

    # auto backend: falls back to the exact host path, full results.
    rows = ix.query_batch(["common"], bm25.new(), top_k=10, backend="auto")
    oracle = ix.query("common", bm25.new(), tokenizer, [1.0], top_k=10)
    assert [r.key for r in rows[0]] == [r.key for r in oracle]

    # sharded path: capacity is per shard (2^28 / 8 local slots fits).
    mesh = make_mesh(data=1, docs=8, devices=jax.devices()[:8])
    sdix = ShardedDeviceIndex(ix, mesh)
    srows = sdix.query_batch(["common"], bm25.new(), top_k=10)
    assert {r.key for r in srows[0]} == {r.key for r in oracle}


def test_stateful_scorer_reuse_across_queries():
    # zero_to_one clears state between queries (zero_to_one.rs:125).
    ix = build_test_index(["abc", "abd"])
    scorer = zero_to_one.new()
    r1 = ix.query("abc", scorer, tokenizer, [1.0])
    r2 = ix.query("abc", scorer, tokenizer, [1.0])
    assert [(r.key, r.score) for r in r1] == [(r.key, r.score) for r in r2]


def test_non_power_of_two_chunk_falls_back_to_sort_merge():
    # chunk_size that is a multiple of 128 but not a power of two routes the
    # staged path through the general sort-based merge (the pre-sorted-runs
    # odd-even network needs power-of-two runs) — results must not change.
    from probly_search_tpu import Index, bm25, whitespace_tokenizer

    ix = Index(1)
    f0 = lambda d: [d]
    rng = random.Random(11)
    vocab = ["w%02d" % i for i in range(40)]
    for i in range(300):
        ix.add_document(
            [f0], whitespace_tokenizer, i,
            " ".join(rng.choice(vocab) for _ in range(6)),
        )
    ix.remove_document(7)  # latent delete in the snapshot
    ix.config.chunk_size = 384
    dix = ix.device_index()
    assert dix.CHUNK == 384
    qs = ["w01 w02", "w0", "w39 w11 w22", ""]
    rows = dix.query_batch(qs, bm25.new(), top_k=5)
    for q, got in zip(qs, rows):
        want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:5]
        assert [g.key for g in got] == [w.key for w in want], (q, got, want)
        for g, w in zip(got, want):
            assert abs(g.score - w.score) <= 2e-5 * max(1.0, abs(w.score))


def test_bare_str_accessor_is_one_value():
    """A field accessor returning a bare str indexes it as ONE value, not a
    char sequence (lib.rs:11 is Vec<&str>; Python's str-is-Sequence[str]
    would otherwise silently index single characters).  Must match the
    list-returning accessor exactly on both the buffered and bulk paths."""
    ix_str = Index(1)
    ix_list = Index(1)
    texts = ["pancake recipe", "paneer curry", "flat bread"]
    for i, t in enumerate(texts):
        ix_str.add_document([lambda d: d], tokenizer, i, t)
        ix_list.add_document([lambda d: [d]], tokenizer, i, t)
    for q in ["pan", "pancake", "bread", "a"]:
        a = ix_str.query(q, bm25.new(), tokenizer, [1.0])
        b = ix_list.query(q, bm25.new(), tokenizer, [1.0])
        assert [(r.key, r.score) for r in a] == [(r.key, r.score) for r in b], q
    assert ix_str.query("pancake", bm25.new(), tokenizer, [1.0])[0].key == 0
    assert ix_str.query("a", bm25.new(), tokenizer, [1.0]) == []


def test_query_batch_top_k_none_returns_all_matches():
    # Explicit top_k=None = the reference's uncapped contract
    # (query.rs:97-105): every matching document, host-served.
    from probly_search_tpu import Index, bm25, whitespace_tokenizer

    ix = Index(1)
    docs = ["a b", "a c", "a d", "b c", "c d", "a a a"]
    ix.add_documents_columnar(list(range(len(docs))), [docs])
    rows = ix.query_batch(["a", "c", "zzz"], bm25.new(), top_k=None)
    for q, row in zip(["a", "c", "zzz"], rows):
        want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])
        assert [r.key for r in row] == [r.key for r in want]
        for got, exp in zip(row, want):
            assert abs(got.score - exp.score) < 1e-12
    assert len(rows[0]) == 4  # more than default_top_k would ever clip


def test_query_batch_top_k_default_and_device_none_raises():
    import pytest

    from probly_search_tpu import Index, bm25

    ix = Index(1)
    ix.add_documents_columnar(list(range(30)), [["a b"] * 30])
    rows = ix.query_batch(["a"], bm25.new())  # omitted -> default_top_k
    assert len(rows[0]) == ix.config.default_top_k
    with pytest.raises(ValueError, match="top_k=None"):
        ix.query_batch(["a"], bm25.new(), top_k=None, backend="device")
    with pytest.raises(ValueError, match="top_k=None"):
        ix.query_batch_async(["a"], bm25.new(), top_k=None)


def test_query_batch_top_k_none_host_scorer_path():
    # A custom scorer without vectorized_query takes the exact host path.
    from probly_search_tpu import Index, whitespace_tokenizer
    from probly_search_tpu.models.base import BaseScoreCalculator

    class CountScorer(BaseScoreCalculator):
        def score(self, pre, pointer, details, node_id, field_data, term_data):
            return float(sum(pointer.term_frequency))

    ix = Index(1)
    docs = ["a b", "a c", "b c"]
    ix.add_documents_columnar(list(range(len(docs))), [docs])
    rows = ix.query_batch(["a b"], CountScorer(), top_k=None)
    want = ix.query("a b", CountScorer(), whitespace_tokenizer, [1.0])
    assert [r.key for r in rows[0]] == [r.key for r in want]
