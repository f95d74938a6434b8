#!/usr/bin/env python
"""A/B the serving configuration on the live workload:

  * chunk width 1024 vs 512 (modal 3-term query: L = 4096 vs 2048 lanes
    now that the merge is odd-even over pre-sorted runs),
  * window 16384 vs 32768 (amortizes the fixed D2H cost),
  * 1 vs 2 drain workers (fetch+assembly overlap).

Prints QPS per configuration.  Diagnostics only; run on the real TPU.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402


def run(dix, scorer, windows, depth, workers, passes=4):
    lat = []

    def drain(t0, h):
        h.get_arrays()
        lat.append(time.perf_counter() - t0)

    n_total = 0
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futs = []
        for _ in range(passes):
            for w in windows:
                h = dix.query_batch_async(w, scorer, top_k=10)
                futs.append(pool.submit(drain, time.perf_counter(), h))
                n_total += len(w)
                if len(futs) >= depth:
                    futs.pop(0).result()
        for f in futs:
            f.result()
    el = time.perf_counter() - t0
    return n_total / el, sorted(lat)[len(lat) // 2]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25

    n_docs = int(1e6)
    t0 = time.time()
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    queries = make_queries(vocab, cdf, 65536, 3)
    log(f"setup {time.time() - t0:.0f}s")

    dixes = {}
    for chunk in (1024, 512):
        ix.config.chunk_size = chunk
        t0 = time.time()
        dixes[chunk] = ix.device_index()
        assert dixes[chunk].CHUNK == chunk, dixes[chunk].CHUNK
        log(f"snapshot C={chunk}: {time.time() - t0:.1f}s")

    configs = (
        ("C1024_W16384_d3_w1", 1024, 16384, 3, 1),
        ("C512_W16384_d3_w1", 512, 16384, 3, 1),
        ("C1024_W32768_d3_w1", 1024, 32768, 3, 1),
        ("C512_W32768_d3_w1", 512, 32768, 3, 1),
    )
    # Warmup/compile every config first, then interleave timed reps —
    # tunnel/host load varies minute to minute, so per-config medians from
    # interleaved reps are the only comparable numbers.
    for name, chunk, window, depth, workers in configs:
        dix = dixes[chunk]
        windows = [queries[i : i + window] for i in range(0, 65536, window)]
        t0 = time.time()
        for w in windows:
            dix.query_batch(w, scorer, top_k=10)
        log(f"warm {name}: {time.time() - t0:.0f}s")
    results = {name: [] for name, *_ in configs}
    for rep in range(3):
        for name, chunk, window, depth, workers in configs:
            dix = dixes[chunk]
            windows = [queries[i : i + window] for i in range(0, 65536, window)]
            qps, p50 = run(dix, scorer, windows, depth, workers)
            results[name].append(qps)
            log(f"rep{rep} {name}: {qps:7.0f} QPS (p50 {1e3 * p50:.0f}ms)")
    for name, vals in results.items():
        vals = sorted(vals)
        log(f"FINAL {name}: median {vals[len(vals) // 2]:.0f} max {vals[-1]:.0f}")


if __name__ == "__main__":
    main()
