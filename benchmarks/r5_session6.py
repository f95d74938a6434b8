#!/usr/bin/env python
"""Round-3 TPU session 6: BM25 headline — pow2 row-split A/B + drain split.

The bench window wastes ~34% of device compute on padding: pow2 row pads
are ~10 points of it (r5 host analysis, /tmp/lane_waste.py recorded in
PERFORMANCE.md).  pow2_row_split re-tiles each class into greedy pow2
sub-dispatches inside the same window program.  Device ~90 ms/window was
the co-bind with drain ~97 ms; if split cuts device to ~81 ms the headline
should move only if drain also drops — the new query/fetch timer splits
drain into tunnel fetch vs host assembly to size the next move.
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
    from concurrent.futures import ThreadPoolExecutor
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from probly_search_tpu import Index, IndexConfig, bm25
    from probly_search_tpu.utils.metrics import metrics

    out = {}
    window = 16384
    top_k = 10
    depth = 3

    t0 = time.time()
    vocab, cdf, texts = bench.make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = bench.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index built ({time.time() - t0:.0f}s)")

    modes = []
    for split in (False, True):
        dix.config.pow2_row_split = split
        tw = time.time()
        try:
            for w in windows:
                dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
            log(f"warm[split={split}] ({time.time() - tw:.0f}s)")
            out[f"warm_s_split_{split}"] = round(time.time() - tw, 1)
            modes.append(split)
        except Exception as e:
            log(f"warm[split={split}] FAILED: {e!r:.600s}")
            out[f"warm_error_split_{split}"] = repr(e)[:300]

    # Ranking identity between modes (spans re-tile the same job rows).
    dix.config.pow2_row_split = False
    base = dix.query_batch_async(windows[0][:4096], scorer, top_k=top_k).get_arrays()
    dix.config.pow2_row_split = True
    split_r = dix.query_batch_async(windows[0][:4096], scorer, top_k=top_k).get_arrays()
    assert (base[1] == split_r[1]).all()
    out["rankings_identical"] = True
    log("rankings identical across modes")

    def section(split, passes=3):
        dix.config.pow2_row_split = split
        t1 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _ in range(passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    futs.append(pool.submit(h.get_arrays))
                    n_total += len(w)
                    if len(futs) >= depth:
                        futs.pop(0).result()
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t1)

    res = {m: [] for m in modes}
    phases = {m: {} for m in modes}
    for rep in range(5):
        for m in modes:
            metrics.reset()
            q = section(m)
            res[m].append(q)
            snap = metrics.snapshot()["histograms"]
            for name in (
                "query/plan", "query/pack", "query/h2d", "query/dispatch",
                "query/drain", "query/fetch",
            ):
                h = snap.get(name)
                if h:
                    phases[m].setdefault(name, []).append(h["mean_us"] / 1e3)
            log(f"rep {rep} split={m}: {q:.0f} QPS")
    for m in modes:
        med = sorted(res[m])[len(res[m]) // 2]
        tag = "split" if m else "nosplit"
        log(f"{tag}: {[f'{q:.0f}' for q in res[m]]} median {med:.0f}")
        out[f"qps_{tag}"] = round(med, 1)
        out[f"qps_{tag}_reps"] = [round(q) for q in res[m]]
        for name, vals in phases[m].items():
            key = f"{name.split('/')[-1]}_ms_{tag}"
            out[key] = round(sorted(vals)[len(vals) // 2], 2)
            log(f"  {tag} {name}: median {out[key]:.2f} ms/window")

    # Sync (no-pipeline) window time per mode: device+fetch visibility.
    for m in modes:
        dix.config.pow2_row_split = m
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
            ts.append(1e3 * (time.perf_counter() - t1))
        tag = "split" if m else "nosplit"
        out[f"sync_window_ms_{tag}"] = round(sorted(ts)[1], 1)
        log(f"sync window {tag}: {sorted(ts)[1]:.0f}ms {[f'{t:.0f}' for t in ts]}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
