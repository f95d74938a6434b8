#!/usr/bin/env python
"""Decide whether the window's device time is DMA-issue-bound: run the
8192-query window normally, then with ops.pallas_query._DMA_TEST_MODE=1
(one small DMA per row instead of NC per row; garbage results, identical
compute).  Diagnostics only."""

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
    import probly_search_tpu.ops.pallas_query as pq

    n_docs = int(1e6)
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 8192, 3)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    dix = ix.device_index()
    for mode in (0, 1, 0):
        pq._DMA_TEST_MODE = mode
        dev._STEP_CACHE.clear()
        def run():
            # sync on the packed device result (garbage-safe: no host-side
            # result assembly, which would index with corrupt doc slots)
            h = dix.query_batch_async(queries, scorer, top_k=10)
            np.asarray(h._packed)

        t0 = time.perf_counter()
        run()
        compile_t = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        log(
            f"W=8192 dma_test={mode}: min {1e3 * min(times):.0f}ms avg "
            f"{1e3 * sum(times) / 3:.0f}ms (compile {compile_t:.0f}s)"
        )
    pq._DMA_TEST_MODE = 0


if __name__ == "__main__":
    main()
