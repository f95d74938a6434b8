"""Blocking-path window splitting (IndexConfig.serving_window) and the
low_latency preset: split submissions must be result-identical to the
single-window submission (queries are independent)."""

import random

import numpy as np

from probly_search_tpu import Index, IndexConfig, bm25
from .util import Doc, title_extract, tokenizer


def _build(config=None, n=120, seed=5):
    rng = random.Random(seed)
    vocab = ["".join(rng.choice("abcdef") for _ in range(rng.randint(1, 4))) for _ in range(50)]
    ix = Index(1, config=config) if config else Index(1)
    for i in range(n):
        ix.add_document(
            [title_extract], tokenizer, i,
            Doc(id=i, title=" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 8)))),
        )
    qs = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3))) for _ in range(30)]
    return ix, qs


def _rows_equal(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert [r.key for r in ra] == [r.key for r in rb]
        np.testing.assert_allclose(
            [r.score for r in ra], [r.score for r in rb], rtol=0, atol=0
        )


def test_split_matches_single_window():
    ix_plain, qs = _build()
    ix_split, _ = _build(config=IndexConfig(serving_window=8, serving_depth=2))
    base = ix_plain.device_index().query_batch(qs, bm25.new(), tokenizer, top_k=5)
    split = ix_split.device_index().query_batch(qs, bm25.new(), tokenizer, top_k=5)
    _rows_equal(base, split)


def test_split_depth_one_and_tail():
    # depth 1 = fully synchronous windows; 30 % 8 != 0 exercises the tail.
    ix_plain, qs = _build(seed=6)
    ix_split, _ = _build(config=IndexConfig(serving_window=7, serving_depth=1), seed=6)
    base = ix_plain.device_index().query_batch(qs, bm25.new(), tokenizer, top_k=3)
    split = ix_split.device_index().query_batch(qs, bm25.new(), tokenizer, top_k=3)
    _rows_equal(base, split)


def test_low_latency_preset_fields():
    cfg = IndexConfig.low_latency()
    assert cfg.serving_window > 0
    assert cfg.serving_depth >= 1
    # overrides pass through
    cfg2 = IndexConfig.low_latency(serving_window=1024, default_top_k=5)
    assert cfg2.serving_window == 1024 and cfg2.default_top_k == 5


def test_no_split_below_window():
    ix, qs = _build(config=IndexConfig(serving_window=64), seed=7)
    rows = ix.device_index().query_batch(qs[:10], bm25.new(), tokenizer, top_k=5)
    assert len(rows) == 10


def test_z2o_split_matches_single_window():
    from probly_search_tpu.ops.z2o_device import z2o_query_batch

    ix_plain, qs = _build(seed=8)
    ix_split, _ = _build(config=IndexConfig(serving_window=8, serving_depth=2), seed=8)
    base = z2o_query_batch(ix_plain.device_index(), qs, tokenizer, 5)
    split = z2o_query_batch(ix_split.device_index(), qs, tokenizer, 5)
    _rows_equal(base, split)
