"""Per-class dispatch mode (IndexConfig.per_class_dispatch): each shape
class runs as its own device program (jit-keyed on the class shape alone)
plus one tiny per-composition pack program — bit-identical packed windows
to the composed `_window_step_impl` path across every result format,
including range classes and mixed compositions."""

import random

import numpy as np

from probly_search_tpu import Index, bm25, whitespace_tokenizer
from probly_search_tpu.config import IndexConfig


def _corpus(n=300, seed=77):
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abcdefg") for _ in range(rng.randint(1, 5)))
        for _ in range(150)
    ]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 10)))
        for _ in range(n)
    ]
    queries = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
        for _ in range(24)
    ]
    queries += [rng.choice(vocab)[:1] for _ in range(6)]  # prefix/range jobs
    queries += ["", "zzzzz"]  # empty + no-match rows
    return texts, queries


def _build(fmt, **cfg_kw):
    texts, queries = _corpus()
    ix = Index(1, config=IndexConfig(result_format=fmt, **cfg_kw))
    ix.add_documents_columnar(list(range(len(texts))), [texts])
    return ix, queries


def _serve(ix, queries, k=10):
    dix = ix.device_index()
    h = dix.query_batch_async(queries, bm25.new(), top_k=k)
    return h.get_arrays()


class TestPerClassDispatch:
    def test_formats_match_composed(self):
        for fmt in ("f32", "compact", "slots", "slots20"):
            # Force the actual composed `_window_step_impl` baseline:
            # template_compositions defaults ON, which would otherwise be
            # the "base" side of this equality (advisor finding, round 4).
            ix, queries = _build(
                fmt, template_compositions=False, per_class_dispatch=False
            )
            base = _serve(ix, queries)
            # The mode flag is read per query_batch_async call off the
            # shared config object — the cached DeviceIndex picks it up.
            ix.config.per_class_dispatch = True
            per_class = _serve(ix, queries)
            for a, b, name in zip(base, per_class, ("scores", "slots", "keys")):
                if a is None or (name == "scores" and fmt.startswith("slots")):
                    assert b is None or name != "scores"
                    continue
                np.testing.assert_array_equal(a, b, err_msg=(fmt, name))

    def test_matches_oracle_with_ranges(self):
        # range_min_expansions=2: prefix queries become term-range classes,
        # exercising the aux-carrying per-class program.
        ix, queries = _build("f32", range_min_expansions=2)
        ix.config.per_class_dispatch = True
        dix = ix.device_index()
        rows = dix.query_batch(queries, bm25.new(), top_k=10)
        for q, row in zip(queries, rows):
            want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:10]
            assert [r.key for r in row] == [r.key for r in want], q
            for a, b in zip(row, want):
                np.testing.assert_allclose(a.score, b.score, rtol=2e-5, atol=1e-6)

    def test_words_buffer_bucketing_no_retrace(self):
        # The packed H2D buffer is padded to a pow2 bucket, so a class
        # program's jit key does not change when ANOTHER class joins the
        # window (advisor finding, r4: unbucketed words_flat length
        # retraced every class program per composition).  Window 2 adds a
        # new nc class; the shared class's program must be reused — the
        # cache grows by exactly the one new class shape.
        from probly_search_tpu.index import device as dev

        texts = ["a x", "b c y", "d q", "e r", "f s", "g t"]
        ix = Index(
            1, config=IndexConfig(result_format="f32", per_class_dispatch=True)
        )
        ix.add_documents_columnar(list(range(len(texts))), [texts])
        dix = ix.device_index()
        scorer = bm25.new()
        dix.query_batch_async(["a", "b c"], scorer, top_k=5).get_arrays()
        cstep = dev._get_class_step(scorer)
        n = cstep._cache_size()
        # Same two queries plus a 4-term one: the nc-2 class statics are
        # unchanged and the words buffer stays in the same 1024 bucket.
        dix.query_batch_async(
            ["a", "b c", "d e f g"], scorer, top_k=5
        ).get_arrays()
        assert cstep._cache_size() == n + 1

    def test_compile_economics_counter(self):
        # The per-class mode must not grow _STEP_CACHE per window: two
        # different query mixes reuse the same jitted class/pack wrappers.
        from probly_search_tpu.index import device as dev

        ix, queries = _build("slots20")
        ix.config.per_class_dispatch = True
        dix = ix.device_index()
        dix.query_batch_async(queries[:8], bm25.new(), top_k=10).get_arrays()
        n_keys = len(dev._STEP_CACHE)
        dix.query_batch_async(queries[8:], bm25.new(), top_k=10).get_arrays()
        assert len(dev._STEP_CACHE) == n_keys
