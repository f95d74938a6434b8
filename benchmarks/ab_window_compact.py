#!/usr/bin/env python
"""A/B: 16384 vs 32768-query windows under the compact result format.

r3 measured window 32768 as a wash at the 80 B/query f32 format; compact
(60 B/query) raises the fixed-cost share per fetch, so re-test.  Sections
interleave A/B in one process (CLAUDE.md discipline).
"""

import json
import sys
import time


sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from bench import make_corpus, make_queries
    from probly_search_tpu import Index, IndexConfig, bm25

    n_passes, top_k, depth = 4, 10, 3
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(compact_results=True))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = make_queries(vocab, cdf, 32768 * 2, 3)
    scorer = bm25.new()
    dix = ix.device_index()

    from concurrent.futures import ThreadPoolExecutor

    def windows_of(w):
        return [queries[i : i + w] for i in range(0, len(queries), w)]

    def timed_section(w):
        wins = windows_of(w)
        t0 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for p in range(n_passes):
                for win in wins:
                    h = dix.query_batch_async(win, scorer, top_k=top_k)
                    futs.append(pool.submit(h.get_arrays))
                    n_total += len(win)
                    if len(futs) >= depth:
                        futs.pop(0).result()
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t0)

    for w in (16384, 32768):  # warm
        t0 = time.time()
        for win in windows_of(w):
            dix.query_batch_async(win, scorer, top_k=top_k).get_arrays()
        log(f"warm w={w}: {time.time() - t0:.0f}s")

    res = {16384: [], 32768: []}
    for rep in range(4):
        for w in (16384, 32768):
            q = timed_section(w)
            res[w].append(q)
            log(f"rep {rep} w={w}: {q:.0f} QPS")
    for w in (16384, 32768):
        med = sorted(res[w])[len(res[w]) // 2]
        log(f"w={w}: {[f'{q:.0f}' for q in res[w]]} median {med:.0f}")
        print(json.dumps({"metric": f"bm25_qps_w{w}_compact", "value": round(med, 1),
                          "unit": "queries/s", "vs_baseline": None}))


if __name__ == "__main__":
    main()
