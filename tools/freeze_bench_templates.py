#!/usr/bin/env python
"""Freeze the headline bench's window templates into a checked-in manifest.

Zero-traffic cold start (VERDICT r4 item 2): bench.py loads
``benchmarks/bench_templates.json`` and calls ``DeviceIndex.prewarm`` before
the first query, so the window program is compiled (or, with the persistent
compile cache, cache-loaded in ~0.1 s) before traffic arrives instead of
inside the first serving window.

This tool regenerates that manifest WITHOUT any device work: it rebuilds
the bench's deterministic corpus/queries (bench.make_corpus seed 0 /
make_queries seed 1), runs the host-side plan -> prune -> template-pack
pipeline exactly as ``query_batch_async`` would (index/device.py), and
saves the frozen template.  The manifest is corpus-deterministic, so live
bench traffic hits the same frozen layout and never re-freezes.

Run on any backend (CPU is fine — only jnp.asarray of the snapshot arrays
touches the platform):

    JAX_PLATFORMS=cpu python tools/freeze_bench_templates.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import bench

    from probly_search_tpu import Index, IndexConfig, bm25, whitespace_tokenizer
    from probly_search_tpu.index.device import _scorer_cache_key, resolve_result_format
    from probly_search_tpu.index.prune import prune_plan

    n_docs = int(1e6)
    window = 16384
    n_windows = 2
    top_k = 10

    vocab, cdf, texts = bench.make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = bench.make_queries(vocab, cdf, window * n_windows, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    fmt = resolve_result_format(
        ix.config.effective_result_format(), dix.num_slots
    )
    skey = _scorer_cache_key(scorer)

    for w in windows:
        plan, fallback = dix.plan_batch(w, whitespace_tokenizer, scorer)
        # The bench stream must be all-device and below the heavy-cache
        # threshold (stopwords excluded) — a manifest frozen from a plan
        # the live path would splice differently would never match.
        assert not fallback, f"bench queries must not fall back: {fallback[:4]}"
        assert int(plan.nchunks.max()) < ix.config.heavy_cache_min_chunks
        pool = dix._plan_pools.get(skey)
        if ix.config.prune_blocks and pool is not None and pool.get("prune_enabled"):
            plan = prune_plan(dix, plan, pool, top_k, [1.0])
        tkey = (skey, top_k, fmt, len(w))
        dix._pack_dispatches_template(len(w), plan, tkey)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        "bench_templates.json",
    )
    n = dix.save_templates(path)
    print(f"saved {n} template(s) to {path}: {dix._comp_templates}")


if __name__ == "__main__":
    main()
