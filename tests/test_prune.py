"""Block-max safe top-k pruning (index/prune.py).

The prune rule may only ever REMOVE work, never change answers: every test
serves the same window twice through the same DeviceIndex — once with
``config.prune_blocks`` on, once off — and asserts the returned rows are
IDENTICAL (same keys, bit-equal f32 scores).  Corpora are built so that
pruning provably fires (idf/impact skew) or provably must not (safety
gates), checked via the ``prune/pruned_chunks`` metrics counter.

Reference semantics preserved: the reference scores every live posting and
returns the full result set (`/root/reference/src/query.rs:61-105`);
pruning exists only below the top-k truncation this engine adds, so the
surviving rows must match the score-every-posting answer exactly.
"""

import random

import numpy as np

from probly_search_tpu import Index, bm25, whitespace_tokenizer
from probly_search_tpu.config import IndexConfig
from probly_search_tpu.utils.metrics import metrics

tokenizer = whitespace_tokenizer


def _pruned_chunks() -> int:
    return int(metrics.snapshot()["counters"].get("prune/pruned_chunks", 0))


def _serve_ab(ix, queries, k=3, fields_boost=None, scorer=None):
    """Serve the window pruned and unpruned through ONE snapshot; return
    (pruned_rows, unpruned_rows, chunks_pruned)."""
    scorer = scorer or bm25.new()
    ix.config.prune_blocks = True
    before = _pruned_chunks()
    pruned = ix.query_batch(
        queries, scorer, tokenizer, fields_boost, top_k=k, backend="device"
    )
    n_pruned = _pruned_chunks() - before
    ix.config.prune_blocks = False
    base = ix.query_batch(
        queries, scorer, tokenizer, fields_boost, top_k=k, backend="device"
    )
    ix.config.prune_blocks = True
    return pruned, base, n_pruned


def _assert_rows_equal(pruned, base, queries):
    assert len(pruned) == len(base)
    for q, a, b in zip(queries, pruned, base):
        assert [r.key for r in a] == [r.key for r in b], (q, a, b)
        np.testing.assert_array_equal(
            np.array([r.score for r in a], np.float32),
            np.array([r.score for r in b], np.float32),
            err_msg=q,
        )


def _skewed_index(n=600, hot=(0, 10), chunk=128, fields=1):
    """`common` appears in every doc; docs in [hot) repeat it 4x in a short
    field (high tf-norm impact), the rest once among filler (low impact).
    With chunk_size=128 the hot docs land in the leading chunk(s) and the
    long low-impact tail is provably below the top-k."""
    ix = Index(
        fields,
        config=IndexConfig(chunk_size=chunk, prune_blocks=True),
    )
    keys, cols = list(range(n)), []
    col = []
    for i in range(n):
        if hot[0] <= i < hot[1]:
            col.append("common common common common")
        else:
            col.append(f"common f{i % 97} g{i % 89} h{i % 83} j{i % 79}")
    cols.append(col)
    for _ in range(fields - 1):
        cols.append(["x"] * n)
    ix.add_documents_columnar(keys, cols)
    return ix


class TestPruneFires:
    def test_single_term_prunes_tail_chunks(self):
        ix = _skewed_index()
        queries = ["common"]
        pruned, base, n = _serve_ab(ix, queries, k=3)
        assert n > 0, "skewed single-term query must prune tail chunks"
        _assert_rows_equal(pruned, base, queries)

    def test_mid_job_chunk_split(self):
        # High impacts at BOTH ends of the posting range: the surviving
        # chunks form two runs, so the job must SPLIT (prune.py rebuilds
        # jobs from kept-chunk runs) and still return identical rows.
        ix2 = Index(1, config=IndexConfig(chunk_size=128, prune_blocks=True))
        col = []
        for i in range(600):
            if i < 5 or i >= 595:
                col.append("common common common common")
            else:
                col.append(f"common f{i % 97} g{i % 89} h{i % 83} j{i % 79}")
        ix2.add_documents_columnar(list(range(600)), [col])
        queries = ["common"]
        pruned, base, n = _serve_ab(ix2, queries, k=3)
        assert n > 0
        _assert_rows_equal(pruned, base, queries)

    def test_multi_term_disjunction(self):
        # A rare second term adds slack sum UB(t') to every chunk test;
        # equality must hold whether or not anything prunes.
        ix = _skewed_index()
        # "rare" lives in two low-impact docs.
        ix.add_document(
            [lambda d: [d]], tokenizer, 600, "rare common filler words here"
        )
        ix.add_document([lambda d: [d]], tokenizer, 601, "rare other text")
        queries = ["common rare", "rare", "common common"]
        pruned, base, _ = _serve_ab(ix, queries, k=3)
        _assert_rows_equal(pruned, base, queries)

    def test_window_mixes_pruned_and_unpruned_queries(self):
        ix = _skewed_index()
        queries = ["common", "f1", "g2 h3", "zzz", "", "common f1"]
        pruned, base, n = _serve_ab(ix, queries, k=3)
        assert n > 0
        _assert_rows_equal(pruned, base, queries)


class TestPruneSafetyGates:
    def test_k_above_cap_disables(self):
        ix = _skewed_index()
        ix.config.prune_max_top_k = 4
        pruned, base, n = _serve_ab(ix, ["common"], k=5)
        assert n == 0, "k above prune_max_top_k must disable pruning"
        _assert_rows_equal(pruned, base, ["common"])

    def test_negative_boost_disables(self):
        ix = _skewed_index(fields=2)
        pruned, base, n = _serve_ab(
            ix, ["common"], k=3, fields_boost=[1.0, -0.5]
        )
        assert n == 0, "negative boosts void the bound monotonicity"
        _assert_rows_equal(pruned, base, ["common"])

    def test_range_queries_never_pruned(self):
        # Prefix queries expanding past range_min_expansions carry a
        # term-range job; the whole query is exempt.
        ix = Index(
            1,
            config=IndexConfig(
                chunk_size=128, prune_blocks=True, range_min_expansions=4
            ),
        )
        col = [f"common w{i}x w{i}y w{i}z" for i in range(400)]
        ix.add_documents_columnar(list(range(400)), [col])
        queries = ["w", "common"]
        pruned, base, _ = _serve_ab(ix, queries, k=3)
        _assert_rows_equal(pruned, base, queries)

    def test_scorer_without_impact_never_pruned(self):
        from probly_search_tpu import zero_to_one

        ix = _skewed_index(n=200)
        before = _pruned_chunks()
        a = ix.query_batch(
            ["common"], zero_to_one.new(), tokenizer, top_k=3, backend="device"
        )
        assert _pruned_chunks() == before
        assert a and a[0]

    def test_zero_boost_field(self):
        # boost 0: the -inf "fewer than k postings" marker must stay -inf
        # (0 * -inf would be nan) and results must match.
        ix = _skewed_index(fields=2)
        pruned, base, _ = _serve_ab(
            ix, ["common", "f1"], k=3, fields_boost=[1.0, 0.0]
        )
        _assert_rows_equal(pruned, base, ["common", "f1"])


class TestPruneWithMutations:
    def test_dead_top_docs_excluded_from_bounds(self):
        # The hottest docs are removed BEFORE the snapshot: their lanes are
        # dead on device AND must be zeroed in the bounds (a stale tau from
        # dead impacts would over-prune live results).
        ix = _skewed_index(n=600, hot=(0, 10))
        for i in range(10):
            ix.remove_document(i)
        queries = ["common"]
        pruned, base, _ = _serve_ab(ix, queries, k=3)
        _assert_rows_equal(pruned, base, queries)

    def test_vacuum_then_prune(self):
        ix = _skewed_index(n=400, hot=(0, 8))
        for i in range(4, 12):
            ix.remove_document(i)
        ix.vacuum()
        queries = ["common", "f1 common"]
        pruned, base, _ = _serve_ab(ix, queries, k=3)
        _assert_rows_equal(pruned, base, queries)

    def test_delta_segment_jobs(self):
        # Postings of one term across base + delta segments: bounds are
        # per job (per segment), df/scale shared across the group.
        ix = _skewed_index(n=300, hot=(0, 6))
        for i in range(300, 340):
            ix.add_document(
                [lambda d: [d]], tokenizer, i, f"common t{i} u{i} v{i} w{i}"
            )
        assert ix.num_segments > 1
        queries = ["common"]
        pruned, base, _ = _serve_ab(ix, queries, k=3)
        _assert_rows_equal(pruned, base, queries)


class TestPruneFuzz:
    def test_random_corpora_exactness(self):
        rng = random.Random(4242)
        for trial in range(4):
            vocab = [
                "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 4)))
                for _ in range(30)
            ]
            n = 350
            col = []
            for i in range(n):
                # Heavy skew: a few terms are very common with varying tf.
                words = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
                if rng.random() < 0.6:
                    words += ["hot"] * rng.randint(1, 4)
                col.append(" ".join(words))
            ix = Index(
                1, config=IndexConfig(chunk_size=128, prune_blocks=True)
            )
            ix.add_documents_columnar(list(range(n)), [col])
            for i in rng.sample(range(n), 25):
                ix.remove_document(i)
            queries = ["hot"] + [
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
                for _ in range(12)
            ]
            queries += [rng.choice(vocab)[:1], "hot " + rng.choice(vocab)]
            for k in (1, 3, 10):
                pruned, base, _ = _serve_ab(ix, queries, k=k)
                _assert_rows_equal(pruned, base, queries)

    def test_oracle_recall_under_pruning(self):
        # Belt-and-braces: the pruned device top-k must still contain every
        # doc the f64 host oracle puts clearly inside the top-k.
        ix = _skewed_index()
        k = 5
        rows = ix.query_batch(
            ["common"], bm25.new(), tokenizer, top_k=k, backend="device"
        )[0]
        oracle = ix.query("common", bm25.new(), tokenizer, [1.0])[:k]
        kth = oracle[-1].score
        must = {r.key for r in oracle if r.score > kth * (1 + 2e-5) + 1e-6}
        assert must <= {r.key for r in rows}
