"""Snapshot save/load: query results must be identical across a round trip,
including latent-deletion state (SURVEY §5 checkpoint/resume plan)."""


from probly_search_tpu import Index, bm25, zero_to_one
from probly_search_tpu.index import snapshot
from .util import Doc, build_test_index, title_extract, tokenizer


def _results(ix, queries, scorer_mod):
    return [
        [(r.key, r.score) for r in ix.query(q, scorer_mod.new(), tokenizer, [1.0] * ix.num_fields)]
        for q in queries
    ]


def test_roundtrip_basic(tmp_path):
    ix = build_test_index(["abc def", "abd xyz", "abc abc q"])
    path = str(tmp_path / "snap.npz")
    snapshot.save(ix, path)
    ix2 = snapshot.load(path)
    queries = ["abc", "ab", "xyz", "q d"]
    assert _results(ix, queries, bm25) == _results(ix2, queries, bm25)
    assert _results(ix, queries, zero_to_one) == _results(ix2, queries, zero_to_one)
    assert ix2.fields[0].sum == ix.fields[0].sum
    assert ix2.fields[0].avg == ix.fields[0].avg


def test_roundtrip_latent_deletion(tmp_path):
    ix = build_test_index(["abc", "abd", "abe"])
    ix.remove_document(1)
    path = str(tmp_path / "snap.npz")
    snapshot.save(ix, path)
    ix2 = snapshot.load(path)
    # Latent state preserved: expansion sees the dead term, df is 0.
    assert ix2.expand_term("ab") == ["abc", "abd", "abe"]
    assert ix2.document_frequency("abd") == 0
    assert _results(ix, ["ab"], bm25) == _results(ix2, ["ab"], bm25)
    ix2.vacuum()
    assert ix2.expand_term("ab") == ["abc", "abe"]


def test_roundtrip_continues_mutating(tmp_path):
    ix = build_test_index(["abc def", "ghi"])
    path = str(tmp_path / "snap.npz")
    snapshot.save(ix, path)
    ix2 = snapshot.load(path)
    ix2.add_document([title_extract], tokenizer, 99, Doc(id=99, title="abc zzz"))
    r = ix2.query("zzz", bm25.new(), tokenizer, [1.0])
    assert r and r[0].key == 99
    assert ix2.document_frequency("abc") == 2


def test_roundtrip_tuple_keys(tmp_path):
    ix = Index(1)
    ix.add_document([lambda d: [d]], tokenizer, ("a", 1), "hello world")
    ix.add_document([lambda d: [d]], tokenizer, ("b", 2), "hello there")
    path = str(tmp_path / "snap.npz")
    snapshot.save(ix, path)
    ix2 = snapshot.load(path)
    r = ix2.query("hello", bm25.new(), tokenizer, [1.0])
    assert {x.key for x in r} == {("a", 1), ("b", 2)}


def test_roundtrip_device_query(tmp_path):
    ix = build_test_index([f"w{i} shared" for i in range(30)])
    path = str(tmp_path / "snap.npz")
    snapshot.save(ix, path)
    ix2 = snapshot.load(path)
    rows = ix2.query_batch(["shared", "w3"], bm25.new(), top_k=5)
    oracle = ix2.query("w3", bm25.new(), tokenizer, [1.0])
    assert rows[1][0].key == oracle[0].key
