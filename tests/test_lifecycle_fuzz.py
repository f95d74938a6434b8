"""Randomized lifecycle parity fuzz.

Each seed builds a random multi-field corpus, applies a random op sequence
(bulk add, per-doc add, remove, re-add, vacuum, snapshot round-trip), then
checks the batched device path against the exact f64 host oracle on random
queries (exact terms, prefixes, multi-term, empty, unknown).  The targeted
golden tests pin the reference semantics; this sweep hunts interaction
bugs between mutation, segment merging, and the device planner.
"""

import random

import numpy as np
import pytest

from probly_search_tpu import Index, IndexConfig, bm25, whitespace_tokenizer
from probly_search_tpu.index.snapshot import load, save


def _accessors(n_fields):
    return [lambda d, f=f: [d[f]] for f in range(n_fields)]


@pytest.mark.parametrize("seed", range(6))
def test_lifecycle_parity(seed, tmp_path):
    rng = random.Random(seed)
    n_fields = rng.choice([1, 1, 2, 3])
    vocab = ["w%03d" % i for i in range(rng.choice([30, 120]))]
    acc = _accessors(n_fields)

    def make_doc():
        return tuple(
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 7)))
            for _ in range(n_fields)
        )

    # Random serving config: compact drain on/off, term-range jobs forced
    # on (low threshold) / default / off — the parity contract is
    # config-independent (compact only f16-quantizes reported scores).
    cfg = IndexConfig(
        compact_results=rng.random() < 0.5,
        range_min_expansions=rng.choice([0, 4, 64]),
    )
    ix = Index(n_fields, config=cfg)
    next_key = 0
    live = []

    # Seed bulk load (exercises the native tokenizer + columnar pipeline).
    n0 = rng.randint(5, 60)
    docs0 = [make_doc() for _ in range(n0)]
    ix.add_documents_columnar(
        list(range(n0)), [[d[f] for d in docs0] for f in range(n_fields)]
    )
    live = list(range(n0))
    next_key = n0

    for _ in range(rng.randint(3, 10)):
        op = rng.random()
        if op < 0.45:
            ix.add_document(acc, whitespace_tokenizer, next_key, make_doc())
            live.append(next_key)
            next_key += 1
        elif op < 0.65 and live:
            k = live.pop(rng.randrange(len(live)))
            ix.remove_document(k)
        elif op < 0.75 and live:
            # re-add an existing key (documented remove-then-add semantics)
            k = rng.choice(live)
            ix.add_document(acc, whitespace_tokenizer, k, make_doc())
        elif op < 0.85:
            ix.vacuum()
        else:
            p = tmp_path / f"snap{seed}_{rng.randrange(1 << 30)}.npz"
            save(ix, str(p))
            ix = load(str(p), config=cfg)

    boost = [round(rng.uniform(0.5, 2.0), 2) for _ in range(n_fields)]
    queries = []
    for _ in range(24):
        r = rng.random()
        if r < 0.5:
            queries.append(
                " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
            )
        elif r < 0.8:
            queries.append(rng.choice(vocab)[: rng.randint(1, 3)])  # prefix
        elif r < 0.9:
            queries.append("zzznope")
        else:
            queries.append("")

    dix = ix.device_index()
    # compact mode reports f16-quantized scores (~5e-4 rel); rankings are
    # f32-identical either way.
    tol = 1e-3 if cfg.compact_results else 2e-5
    dp = 2 if cfg.compact_results else 5
    rows = dix.query_batch(queries, bm25.new(), fields_boost=boost, top_k=10)
    for q, got in zip(queries, rows):
        want = ix.query(q, bm25.new(), whitespace_tokenizer, boost, top_k=10)
        gk = [g.key for g in got]
        wk = [w.key for w in want]
        if gk != wk:
            # tie-order may differ legitimately: require identical score
            # multisets and per-rank score equality
            gs = [round(g.score, dp) for g in got]
            ws = [round(w.score, dp) for w in want]
            assert gs == ws and set(gk) == set(wk), (seed, q, got, want)
        for g, w in zip(got, want):
            assert abs(g.score - w.score) <= tol * max(1.0, abs(w.score)), (
                seed,
                q,
                g,
                w,
            )
        assert np.all(np.isfinite([g.score for g in got]))


@pytest.mark.parametrize("seed", range(3))
def test_lifecycle_parity_zero_to_one(seed, tmp_path):
    """Same lifecycle sweep against the zero-to-one scorer: its device
    program, host-vectorized fallback, and exact host path must agree
    through mutations, vacuum, and snapshot cycles."""
    from probly_search_tpu import zero_to_one

    rng = random.Random(100 + seed)
    n_fields = rng.choice([1, 2])
    vocab = ["w%02d" % i for i in range(40)]
    acc = _accessors(n_fields)

    def make_doc():
        return tuple(
            " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 5)))
            for _ in range(n_fields)
        )

    ix = Index(n_fields)
    n0 = rng.randint(10, 40)
    docs0 = [make_doc() for _ in range(n0)]
    ix.add_documents_columnar(
        list(range(n0)), [[d[f] for d in docs0] for f in range(n_fields)]
    )
    live = list(range(n0))
    for _ in range(rng.randint(2, 6)):
        op = rng.random()
        if op < 0.5:
            k = n0 + rng.randrange(1000)
            ix.add_document(acc, whitespace_tokenizer, k, make_doc())
            live.append(k)
        elif op < 0.7 and live:
            ix.remove_document(live.pop(rng.randrange(len(live))))
        elif op < 0.85:
            ix.vacuum()
        else:
            p = tmp_path / f"z{seed}_{rng.randrange(1 << 30)}.npz"
            save(ix, str(p))
            ix = load(str(p))

    queries = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 2)))
        for _ in range(8)
    ] + [rng.choice(vocab)[:2], ""]
    rows = ix.query_batch(queries, zero_to_one.new(), top_k=10, backend="device")
    for q, got in zip(queries, rows):
        want = ix.query(q, zero_to_one.new(), whitespace_tokenizer, None, top_k=10)
        gs = sorted(g.score for g in got)
        ws = sorted(w.score for w in want)
        assert len(gs) == len(ws), (seed, q, got, want)
        assert all(abs(a - b) <= 2e-5 for a, b in zip(gs, ws)), (seed, q, got, want)
