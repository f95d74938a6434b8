"""Template compositions (IndexConfig.template_compositions): the window's
shape-class composition is frozen into a reusable template — identical
results to the per-composition composed path, ONE window program per
(scorer, k, fmt, window size) stream, overflow spilling into larger
classes, and refreezes only when a window outgrows the template."""

import random

import numpy as np

from probly_search_tpu import Index, bm25, whitespace_tokenizer
from probly_search_tpu.config import IndexConfig
from probly_search_tpu.utils.metrics import metrics


def _corpus(n=300, seed=77, with_prefixes=True):
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
    if with_prefixes:
        queries += [rng.choice(vocab)[:1] for _ in range(6)]
        queries += ["", "zzzzz"]
    return texts, queries


def _build(fmt="f32", n=300, **cfg_kw):
    texts, queries = _corpus(n=n)
    ix = Index(1, config=IndexConfig(result_format=fmt, **cfg_kw))
    ix.add_documents_columnar(list(range(len(texts))), [texts])
    return ix, queries


def _serve(ix, queries, k=10):
    dix = ix.device_index()
    return dix.query_batch_async(queries, bm25.new(), top_k=k).get_arrays()


class TestTemplateCompositions:
    def test_formats_match_composed(self):
        for fmt in ("f32", "compact", "slots", "slots20"):
            # template_compositions defaults ON — the baseline must force
            # the per-composition composed path or this compares the
            # template path to itself (advisor finding, round 4).
            ix, queries = _build(
                fmt, template_compositions=False, per_class_dispatch=False
            )
            base = _serve(ix, queries)
            ix.config.template_compositions = True
            tpl = _serve(ix, queries)
            for a, b, name in zip(base, tpl, ("scores", "slots", "keys")):
                if a is None or (name == "scores" and fmt.startswith("slots")):
                    assert b is None or name != "scores"
                    continue
                np.testing.assert_array_equal(a, b, err_msg=(fmt, name))

    def test_range_windows_fall_back_correctly(self):
        # range_min_expansions=2 turns prefix queries into term-range jobs;
        # such windows take the per-composition path but must stay exact.
        ix, queries = _build("f32", range_min_expansions=2)
        ix.config.template_compositions = True
        dix = ix.device_index()
        rows = dix.query_batch(queries, bm25.new(), top_k=10)
        for q, row in zip(queries, rows):
            want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:10]
            assert [r.key for r in row] == [r.key for r in want], q
            for a, b in zip(row, want):
                np.testing.assert_allclose(a.score, b.score, rtol=2e-5, atol=1e-6)

    def test_template_reuse_single_freeze(self):
        # Windows of the same size with different query mixes reuse ONE
        # frozen template (no refreeze) and keep oracle-equal results.
        texts, _ = _corpus(with_prefixes=False)
        rng = random.Random(3)
        vocab = sorted({t for s in texts for t in s.split()})
        ix = Index(1, config=IndexConfig(template_compositions=True))
        ix.add_documents_columnar(list(range(len(texts))), [texts])
        dix = ix.device_index()
        windows = [
            [
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
                for _ in range(16)
            ]
            for _ in range(4)
        ]
        before = metrics.counters["template_refreezes"]
        for w in windows:
            rows = dix.query_batch(w, bm25.new(), top_k=5)
            for q, row in zip(w, rows):
                want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:5]
                assert [r.key for r in row] == [r.key for r in want], q
        assert len(dix._comp_templates) == 1
        freezes = metrics.counters["template_refreezes"] - before
        assert freezes <= 2, freezes  # first freeze (+ at most one growth)

    def test_spill_overflow_into_larger_class(self):
        # Freeze on a mixed window, then serve a window skewed toward one
        # class: overflow must spill upward (or refreeze) without losing
        # parity with the host oracle.
        texts, _ = _corpus(with_prefixes=False)
        rng = random.Random(11)
        vocab = sorted({t for s in texts for t in s.split()})
        ix = Index(1, config=IndexConfig(template_compositions=True))
        ix.add_documents_columnar(list(range(len(texts))), [texts])
        dix = ix.device_index()
        mixed = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
            for _ in range(16)
        ]
        dix.query_batch(mixed, bm25.new(), top_k=5)
        skew = [rng.choice(vocab) for _ in range(16)]  # all 1-term queries
        rows = dix.query_batch(skew, bm25.new(), top_k=5)
        for q, row in zip(skew, rows):
            want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:5]
            assert [r.key for r in row] == [r.key for r in want], q

    def test_manifest_roundtrip_and_prewarm(self, tmp_path):
        # save_templates -> load_templates in a fresh DeviceIndex ->
        # prewarm compiles the exact window program -> serving reuses it
        # with no refreeze.
        texts, queries = _corpus(with_prefixes=False)
        ix = Index(1, config=IndexConfig(template_compositions=True))
        ix.add_documents_columnar(list(range(len(texts))), [texts])
        dix = ix.device_index()
        scorer = bm25.new()
        want = dix.query_batch(queries[:16], scorer, top_k=5)
        path = str(tmp_path / "templates.json")
        assert dix.save_templates(path) == 1

        ix2 = Index(1, config=IndexConfig(template_compositions=True))
        ix2.add_documents_columnar(list(range(len(texts))), [texts])
        dix2 = ix2.device_index()
        assert dix2.load_templates(path) == 1
        assert dix2.prewarm(scorer) == 1
        before = metrics.counters["template_refreezes"]
        rows = dix2.query_batch(queries[:16], scorer, top_k=5)
        assert metrics.counters["template_refreezes"] == before
        for a, b in zip(rows, want):
            assert [r.key for r in a] == [r.key for r in b]

    def test_save_templates_skips_process_local_scorer_keys(self, tmp_path):
        # A scorer without device_cache_key freezes templates under a
        # process-local ('id', ...) key; saving those would make prewarm
        # silently warm 0 programs in the next process — save_templates
        # skips them with a warning instead (advisor finding, r4).
        import warnings as _warnings

        from probly_search_tpu.models.bm25 import BM25

        class _NoKey(BM25):
            device_cache_key = None  # -> ('id', id(scorer)) cache key

        texts, queries = _corpus(with_prefixes=False)
        ix = Index(1, config=IndexConfig(template_compositions=True))
        ix.add_documents_columnar(list(range(len(texts))), [texts])
        dix = ix.device_index()
        dix.query_batch(queries[:16], _NoKey(), top_k=5)
        assert len(dix._comp_templates) == 1
        path = str(tmp_path / "t.json")
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            assert dix.save_templates(path) == 0
        assert any("device_cache_key" in str(x.message) for x in w)

    def test_window_sizes_key_separate_templates(self):
        texts, queries = _corpus(with_prefixes=False)
        ix = Index(1, config=IndexConfig(template_compositions=True))
        ix.add_documents_columnar(list(range(len(texts))), [texts])
        dix = ix.device_index()
        dix.query_batch(queries[:8], bm25.new(), top_k=5)
        dix.query_batch(queries[:16], bm25.new(), top_k=5)
        assert len(dix._comp_templates) == 2
