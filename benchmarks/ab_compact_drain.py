#!/usr/bin/env python
"""A/B: compact int16[rows, 3, k] result format vs the f32 default at the
headline serving shape (1M docs, 16384-query windows, depth-3 pipeline).

The drain worker's packed-result fetch is the serving pace-setter
(PERFORMANCE.md: ~96 ms vs device ~90 ms; ~65 us/KB through the tunnel).
Compact cuts fetched bytes 25%.  Sections are interleaved A/B/A/B... in ONE
process (tunnel throughput swings +-20% between runs — CLAUDE.md).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from bench import make_corpus, make_queries
    from probly_search_tpu import Index, bm25

    window, n_windows, n_passes, top_k, depth = 16384, 2, 4, 10, 3
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = make_queries(vocab, cdf, window * n_windows, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()

    from concurrent.futures import ThreadPoolExecutor

    def timed_section():
        t0 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    futs.append(pool.submit(h.get_arrays))
                    n_total += len(w)
                    if len(futs) >= depth:
                        futs.pop(0).result()
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t0)

    # warm both variants
    for compact in (False, True):
        dix.config.compact_results = compact
        dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
        dix.query_batch_async(windows[1], scorer, top_k=top_k).get_arrays()
        log(f"warm compact={compact} done")

    res = {False: [], True: []}
    for rep in range(4):
        for compact in (False, True):
            dix.config.compact_results = compact
            q = timed_section()
            res[compact].append(q)
            log(f"rep {rep} compact={compact}: {q:.0f} QPS")

    for compact in (False, True):
        med = sorted(res[compact])[len(res[compact]) // 2]
        log(f"compact={compact}: {[f'{q:.0f}' for q in res[compact]]} median {med:.0f}")
        print(
            json.dumps(
                {
                    "metric": f"bm25_qps_compact_{int(compact)}",
                    "value": round(med, 1),
                    "unit": "queries/s",
                    "vs_baseline": None,
                }
            )
        )

    # sanity: identical rankings between modes on one window
    dix.config.compact_results = False
    sf, lf, kf = dix.query_batch_async(windows[0][:256], scorer, top_k=top_k).get_arrays()
    dix.config.compact_results = True
    sc, lc, kc = dix.query_batch_async(windows[0][:256], scorer, top_k=top_k).get_arrays()
    assert (np.isfinite(sf) == np.isfinite(sc)).all()
    m = np.isfinite(sf)
    assert (lf[m] == lc[m]).all()
    np.testing.assert_allclose(sc[m], sf[m], rtol=2e-3)
    log("compact parity OK")


if __name__ == "__main__":
    main()
