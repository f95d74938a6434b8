#!/usr/bin/env python
"""Post-merge-fix measurements:

  1. device-only time per 16384-query window (submit many, sync last),
  2. the heavy nc=32 class (L=32768): staged-XLA path (over the fused cap)
     vs the fused kernel with the cap lifted to 32768 — feasible now that
     the merge is odd-even levels (~65 stages) instead of a bitonic sort
     (~120 stages, which compiled pathologically past 16k lanes).

Diagnostics only; run on the real TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25
    import probly_search_tpu.index.device as dev

    n_docs = int(1e6)
    t0 = time.time()
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    dix = ix.device_index()
    queries = make_queries(vocab, cdf, 65536, 3)
    log(f"setup {time.time() - t0:.0f}s")

    # --- device-only per window (current config) ------------------------- #
    window = queries[:16384]
    dix.query_batch(window, scorer, top_k=10)  # warm
    t0 = time.perf_counter()
    hs = [dix.query_batch_async(window, scorer, top_k=10) for _ in range(6)]
    np.asarray(hs[-1]._packed)
    t_all = time.perf_counter() - t0
    log(f"device-only: ~{1e3 * t_all / 6:.0f}ms/16384q window (6 submits, sync last)")

    # --- nc=32 class members --------------------------------------------- #
    plan, _fb = dix.plan_batch(queries, dev.whitespace_tokenizer, scorer)
    nc_bucket = np.array([dev._bucket(int(c), dix.NC_BUCKETS, 4) for c in plan.nchunks])
    members = np.flatnonzero(nc_bucket == 32)
    log(f"nc=32 members: {len(members)} of {len(queries)}")
    qs = [queries[i] for i in members]

    for cap in (16384, 32768):
        dev._FUSED_MAX_LANES = cap
        dev._STEP_CACHE.clear()
        t0 = time.perf_counter()
        dix.query_batch(qs, scorer, top_k=10)
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(4):
            h = dix.query_batch_async(qs, scorer, top_k=10)
            h.get_arrays(want_keys=False)
        run_t = (time.perf_counter() - t0) / 4
        log(
            f"nc=32 cap={cap}: {1e3 * run_t:7.1f}ms for B={len(qs)} "
            f"({1e6 * run_t / max(len(qs), 1):6.1f}us/q) compile {compile_t:.0f}s"
        )
    # Correctness spot check with the lifted cap against the host oracle.
    from probly_search_tpu import whitespace_tokenizer

    rows = dix.query_batch(qs[:8], scorer, top_k=10)
    for q, got in zip(qs[:8], rows):
        want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:10]
        assert [g.key for g in got] == [w.key for w in want], (q, got, want)
    log("cap=32768 parity OK on 8 heavy queries")


if __name__ == "__main__":
    main()
