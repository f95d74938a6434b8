#!/usr/bin/env python
"""r7 session 6b (hardware): bench-loop window-size A/B — 8192 vs 16384.

The latency sweep (session 6, single drains) measured 8192 @ depth 4-6 at
252-255k QPS vs 16384 @ depth 4 at 240.9k in the same process.  bench.py
drains in PAIRS one window late (prefetch lands off the critical path),
which the sweep loop does not, so this A/B replays bench.py's exact timed
section per shape before changing the headline window size.

Shapes: (window, pairs in flight): (16384, 2) [ship], (8192, 2),
(8192, 3).  Interleaved 3 reps, medians; queue-8 pace per window size.
"""

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus, make_queries  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu import Index, IndexConfig, bm25

    top_k = 10
    t0 = time.time()
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = make_queries(vocab, cdf, 32768, 3)
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index+snapshot {time.time() - t0:.0f}s")

    wins = {
        16384: [queries[i : i + 16384] for i in range(0, 32768, 16384)],
        8192: [queries[i : i + 8192] for i in range(0, 32768, 8192)],
    }

    # Warm both streams fully BEFORE any timing (session-4 lesson).
    for w, ws in wins.items():
        t1 = time.time()
        for x in ws:
            dix.query_batch_async(x, scorer, top_k=top_k).get_arrays()
        log(f"warm window={w}: {time.time() - t1:.1f}s")

    def timed_section(windows, pairs_in_flight, n_passes):
        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for x in windows:
                    h = dix.query_batch_async(x, scorer, top_k=top_k)
                    pending.append(h)
                    n_total += len(x)
                    if len(pending) == 2:
                        futs.append(
                            pool.submit(lambda pr: [y.get_arrays() for y in pr], pending)
                        )
                        pending = []
                    while len(futs) >= pairs_in_flight:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(lambda pr: [y.get_arrays() for y in pr], pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    shapes = [(16384, 2, 4), (8192, 2, 4), (8192, 3, 4)]
    qps = {s: [] for s in shapes}
    for rep in range(3):
        for s in shapes:
            w, pif, np_ = s
            qps[s].append(timed_section(wins[w], pif, np_))
            log(f"rep{rep} window={w} pairs={pif}: {qps[s][-1]:.0f} QPS")
    out = {
        f"{w}x{pif}": {
            "qps_median": round(sorted(v)[1]),
            "qps_reps": [round(x) for x in v],
        }
        for (w, pif, _), v in qps.items()
    }

    def queue_n(windows, n):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % len(windows)], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        return 1e3 * (time.perf_counter() - t_s)

    for w in (16384, 8192):
        t1 = min(queue_n(wins[w], 1) for _ in range(2))
        t8 = min(queue_n(wins[w], 8) for _ in range(2))
        out[f"pace_{w}_ms"] = round((t8 - t1) / 7.0, 1)
        log(f"pace window={w}: {out[f'pace_{w}_ms']} ms/window")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
