"""Aux subsystems: metrics, profiling phases, native runtime, config."""


from probly_search_tpu import Index, IndexConfig, bm25
from probly_search_tpu.utils.metrics import Registry, index_stats, metrics
from probly_search_tpu.utils.profiling import phase
from .util import build_test_index, tokenizer


def test_metrics_registry():
    r = Registry()
    r.inc("queries")
    r.inc("queries", 2)
    r.set_gauge("docs", 42)
    with r.timer("lat"):
        pass
    snap = r.snapshot()
    assert snap["counters"]["queries"] == 3
    assert snap["gauges"]["docs"] == 42
    assert snap["histograms"]["lat"]["count"] == 1
    r.reset()
    assert r.snapshot()["counters"] == {}


def test_index_stats():
    ix = build_test_index(["a b c", "a d", "e"])
    ix.remove_document(2)
    s = index_stats(ix)
    assert s["docs_live"] == 2
    assert s["doc_slots"] == 3
    assert s["postings"] == 6  # a,b,c | a,d | e  (deduped per (term, doc))
    assert 0 < s["deleted_ratio"] < 1
    assert s["device_bytes"] > 0


def test_phase_timer():
    with phase("unit"):
        pass
    snap = metrics.snapshot()
    assert snap["histograms"]["phase/unit"]["count"] >= 1


def test_native_matches_python_tokenize():
    from probly_search_tpu.native import tokenize_index_native, native_available

    if not native_available():
        return  # environment without g++: python fallback covered elsewhere
    texts = ["hello  world", "", "a b a", "smörgås bord", "x" * 300]
    out = tokenize_index_native(texts)
    tids, counts, terms, lens = out
    # Python reference
    flat = [t for s in texts for t in s.split(" ") if t]
    py_terms = sorted(set(flat))
    assert terms == py_terms
    assert counts.tolist() == [len([t for t in s.split(" ") if t]) for s in texts]
    assert [terms[i] for i in tids] == flat
    assert lens.tolist() == [len(t.encode("utf-8")) for t in terms]


def test_config_knobs():
    cfg = IndexConfig(expected_documents_count=5, pending_flush_docs=2, max_segments=2)
    ix = Index(1, config=cfg)
    for i in range(7):
        ix.add_document([lambda d: [d]], tokenizer, i, f"w{i} shared")
    # pending_flush_docs=2 + max_segments=2 forces merges along the way.
    assert ix.num_segments <= 3
    r = ix.query("shared", bm25.new(), tokenizer, [1.0])
    assert len(r) == 7
