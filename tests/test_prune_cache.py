"""Prune-decision memoization (index/prune.py prune_plan_cached).

The prune outcome per (pooled query, k, boosts) is deterministic on a
frozen snapshot, so repeated queries must (a) return rows bit-equal to the
direct prune pass and the unpruned baseline's surviving top-k, and (b) stop
re-deriving bounds — pinned via the ``prune/cache_fills`` counter, which
counts first-seen (query, k, boosts) fills only.
"""

from probly_search_tpu import Index, bm25, whitespace_tokenizer
from probly_search_tpu.config import IndexConfig
from probly_search_tpu.utils.metrics import metrics

from .test_prune import _assert_rows_equal, _serve_ab, _skewed_index

tokenizer = whitespace_tokenizer


def _fills() -> int:
    return int(metrics.snapshot()["counters"].get("prune/cache_fills", 0))


class TestPruneCache:
    def test_repeat_window_fills_once(self):
        ix = _skewed_index()
        queries = ["common", "f1", "g2 h3", "common f1"]
        dix = ix.device_index()
        scorer = bm25.new()
        before = _fills()
        first = dix.query_batch_async(queries, scorer, top_k=3).get()
        filled = _fills() - before
        assert filled == len(set(queries)), "every first-seen query fills"
        second = dix.query_batch_async(queries, scorer, top_k=3).get()
        assert _fills() - before == filled, "repeat window must not refill"
        _assert_rows_equal(second, first, queries)

    def test_cached_equals_direct_and_unpruned(self):
        ix = _skewed_index()
        queries = ["common", "common f1", "f1 g2"]
        # Warm the cache, then A/B the CACHED pass against prune off.
        ix.query_batch(
            queries, bm25.new(), tokenizer, top_k=3, backend="device"
        )
        pruned, base, n = _serve_ab(ix, queries, k=3)
        assert n > 0
        _assert_rows_equal(pruned, base, queries)

    def test_new_queries_extend_cache(self):
        ix = _skewed_index()
        dix = ix.device_index()
        scorer = bm25.new()
        dix.query_batch_async(["common"], scorer, top_k=3).get()
        before = _fills()
        mixed = ["common", "f1", "common"]
        rows = dix.query_batch_async(mixed, scorer, top_k=3).get()
        assert _fills() - before == 1, "only the unseen query fills"
        ix.config.prune_blocks = False
        base = dix.query_batch_async(mixed, scorer, top_k=3).get()
        ix.config.prune_blocks = True
        _assert_rows_equal(rows, base, mixed)

    def test_k_and_boosts_key_separately(self):
        ix = _skewed_index(fields=2)
        queries = ["common", "common f1"]
        for k, boosts in ((3, [1.0, 1.0]), (5, [1.0, 1.0]), (3, [1.0, 0.0])):
            pruned, base, _ = _serve_ab(ix, queries, k=k, fields_boost=boosts)
            _assert_rows_equal(pruned, base, queries)
            # Serve again — the cached splice path this time.
            again, base2, _ = _serve_ab(ix, queries, k=k, fields_boost=boosts)
            _assert_rows_equal(again, base, queries)
            _assert_rows_equal(base2, base, queries)

    def test_split_jobs_cached(self):
        # Mid-job split (two kept-chunk runs): the alt pool must carry the
        # SPLIT job rows and re-splice them identically on the second pass.
        ix = Index(1, config=IndexConfig(chunk_size=128, prune_blocks=True))
        col = []
        for i in range(600):
            if i < 5 or i >= 595:
                col.append("common common common common")
            else:
                col.append(f"common f{i % 97} g{i % 89} h{i % 83} j{i % 79}")
        ix.add_documents_columnar(list(range(600)), [col])
        queries = ["common"]
        first, base, n = _serve_ab(ix, queries, k=3)
        assert n > 0
        again, base2, n2 = _serve_ab(ix, queries, k=3)
        assert n2 > 0, "cached splice still reports pruned chunks"
        _assert_rows_equal(first, base, queries)
        _assert_rows_equal(again, base, queries)

    def test_cache_dies_with_snapshot(self):
        # A mutation bumps the index version -> a NEW DeviceIndex (and a
        # fresh plan pool): stale pruned rows must not survive into the
        # new snapshot's answers.
        ix = _skewed_index(n=400)
        q = ["common"]
        ix.query_batch(q, bm25.new(), tokenizer, top_k=3, backend="device")
        for i in range(4):
            ix.remove_document(i)
        pruned, base, _ = _serve_ab(ix, q, k=3)
        _assert_rows_equal(pruned, base, q)

    def test_heavy_splice_interplay(self):
        # A heavy-cached query's jobs are spliced OUT of the window plan
        # before pruning (njobs -> 0): the cached prune must treat it as
        # trivially unchanged — never caching a decision for it — while
        # still pruning/memoizing its window-mates, with rows identical
        # to a prune-off serve for every query.
        ix = _skewed_index()
        ix.config.heavy_cache_min_chunks = 2  # "common"'s 600 docs qualify
        queries = ["common", "f1", "common f1"]
        for _ in range(2):  # second pass rides both caches
            pruned, base, _ = _serve_ab(ix, queries, k=3)
            _assert_rows_equal(pruned, base, queries)
        from probly_search_tpu.utils.metrics import metrics

        assert (
            metrics.snapshot()["counters"].get("heavy_cache_hits", 0) > 0
        ), "the heavy query must actually ride the heavy cache"

    def test_fuzz_repeat_windows(self):
        import random

        rng = random.Random(77)
        vocab = ["hot", "aa", "ab", "ba", "bb", "c"]
        n = 300
        col = []
        for i in range(n):
            words = [rng.choice(vocab) for _ in range(rng.randint(1, 6))]
            if rng.random() < 0.5:
                words += ["hot"] * rng.randint(1, 4)
            col.append(" ".join(words))
        ix = Index(1, config=IndexConfig(chunk_size=128, prune_blocks=True))
        ix.add_documents_columnar(list(range(n)), [col])
        queries = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
            for _ in range(10)
        ] + ["hot", "hot aa"]
        for k in (1, 3):
            for _ in range(3):  # repeated windows ride the cache
                pruned, base, _ = _serve_ab(ix, queries, k=k)
                _assert_rows_equal(pruned, base, queries)
