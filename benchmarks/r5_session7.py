#!/usr/bin/env python
"""Round-3 TPU session 7: slots vs slots20 A/B at the 1M-doc BM25 bench.

Session 6 showed drain is ~94% tunnel fetch (88.9 of 94.8 ms at 30 B/q).
slots20 nibble-packs the 20-bit slots to 25 B/q (-17% fetched bytes), the
entropy floor for top-10 of 1M docs.  Expected: fetch drops ~8-10 ms,
QPS 164k -> ~175k if fetch stays the bind.  pow2_row_split stays on.
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
    log(f"index built ({time.time() - t0:.0f}s); num_slots={dix.num_slots}")
    assert dix.num_slots < (1 << 20), "slots20 gate would downgrade"

    fmts = []
    for fmt in ("slots", "slots20"):
        dix.config.result_format = fmt
        tw = time.time()
        try:
            for w in windows:
                dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
            log(f"warm[{fmt}] ({time.time() - tw:.0f}s)")
            out[f"warm_s_{fmt}"] = round(time.time() - tw, 1)
            fmts.append(fmt)
        except Exception as e:
            log(f"warm[{fmt}] FAILED: {e!r:.600s}")
            out[f"warm_error_{fmt}"] = repr(e)[:300]

    # Ranking identity between formats (same device ranking, repacked).
    dix.config.result_format = "slots"
    _, sl_a, _ = dix.query_batch_async(windows[0][:4096], scorer, top_k=top_k).get_arrays()
    dix.config.result_format = "slots20"
    _, sl_b, _ = dix.query_batch_async(windows[0][:4096], scorer, top_k=top_k).get_arrays()
    assert (sl_a == sl_b).all()
    out["rankings_identical"] = True
    log("rankings identical across formats")

    def section(fmt, passes=3):
        dix.config.result_format = fmt
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

    res = {m: [] for m in fmts}
    phases = {m: {} for m in fmts}
    for rep in range(5):
        for m in fmts:
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
            log(f"rep {rep} fmt={m}: {q:.0f} QPS")
    for m in fmts:
        med = sorted(res[m])[len(res[m]) // 2]
        log(f"{m}: {[f'{q:.0f}' for q in res[m]]} median {med:.0f}")
        out[f"qps_{m}"] = round(med, 1)
        out[f"qps_{m}_reps"] = [round(q) for q in res[m]]
        for name, vals in phases[m].items():
            key = f"{name.split('/')[-1]}_ms_{m}"
            out[key] = round(sorted(vals)[len(vals) // 2], 2)
            log(f"  {m} {name}: median {out[key]:.2f} ms/window")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
