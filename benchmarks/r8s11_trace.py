"""r8 session 11: profile the serving loop's device track.

r8s9/s10: serving pays ~54.3 ms/window vs a 48.4 ms/window queue-8
marginal pace; poll-drain falsified (is_ready never turns true promptly
through the tunnel).  Next: stop black-boxing — trace a steady serving
section AND a queue-8 burst, parse the perfetto trace, and measure the
device-track busy/gap structure directly.

Run: python benchmarks/r8s11_trace.py 2>&1 | tee /tmp/r8s11.log
"""

import glob
import gzip
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def analyze(trace_dir, label, min_gap_ms=1.0):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*trace.json.gz"), recursive=True
    )
    if not paths:
        log(f"  [{label}] NO perfetto trace found under {trace_dir}")
        return
    with gzip.open(paths[0], "rt") as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pid_names = {}
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]
    log(f"  [{label}] processes: {sorted(set(pid_names.values()))[:12]}")
    # Device-side tracks: pick pids whose name mentions TPU/device.
    dev_pids = [
        p
        for p, n in pid_names.items()
        if ("TPU" in n or "tpu" in n or "evice" in n) and "CPU" not in n
    ]
    for dp in dev_pids:
        tracks = {}
        for e in ev:
            if e.get("ph") == "X" and e["pid"] == dp:
                tracks.setdefault(
                    tid_names.get((dp, e["tid"]), e["tid"]), []
                ).append(e)
        for tname, es in sorted(tracks.items(), key=lambda kv: str(kv[0])):
            es.sort(key=lambda e: e["ts"])
            t0, t1 = es[0]["ts"], max(e["ts"] + e.get("dur", 0) for e in es)
            span = (t1 - t0) / 1e3
            busy = sum(e.get("dur", 0) for e in es) / 1e3
            # merge overlapping intervals -> true gaps in the track
            iv = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in es)
            gaps = []
            ce = iv[0][0]
            for s, e2 in iv:
                if s > ce:
                    gaps.append((ce, s - ce))
                ce = max(ce, e2)
            big = [
                (round(g / 1e3, 2), round((s - t0) / 1e3, 1))
                for s, g in gaps
                if g / 1e3 >= min_gap_ms
            ]
            names = {}
            for e in es:
                names[e["name"]] = names.get(e["name"], 0) + e.get("dur", 0)
            top = sorted(names.items(), key=lambda kv: -kv[1])[:5]
            log(
                f"  [{label}] {pid_names[dp]!r}/{tname!r}: {len(es)} evs "
                f"span {span:.1f}ms busy {busy:.1f}ms "
                f"gaps>={min_gap_ms}ms: n={len(big)} total={sum(g for g, _ in big):.1f}ms"
            )
            for g, at in big[:25]:
                log(f"      gap {g:7.2f}ms at t+{at:.1f}ms")
            for n, d in top:
                log(f"      top {d / 1e3:8.1f}ms {n[:90]}")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import threading

    t0 = time.time()

    def _init():
        import jax.numpy as _jnp

        np.asarray(jax.jit(lambda x: x + 1)(_jnp.zeros(8, _jnp.int32)))
        log(f"tpu init done t+{time.time() - t0:.1f}s")

    th = threading.Thread(target=_init, daemon=True)
    th.start()

    from bench import make_corpus, make_queries

    from probly_search_tpu import Index, IndexConfig, bm25

    n_docs = int(1e6)
    window = 16384
    top_k = 10
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    th.join()
    dix = ix.device_index()
    man = os.path.join("/root/repo", "benchmarks", "bench_templates.json")
    if os.path.exists(man):
        dix.load_templates(man)
        dix.prewarm(scorer)
    for _ in range(2):
        for w in windows:
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"warm t+{time.time() - t0:.1f}s")

    from concurrent.futures import ThreadPoolExecutor

    def timed_section(n_passes=4, depth=8):
        def drain_pair(pair):
            for t_submit, h in pair:
                h.get_arrays()

        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    pending.append((time.perf_counter(), h))
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(pool.submit(drain_pair, pending))
                        pending = []
                    while len(futs) >= depth // 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(drain_pair, pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    def queue_n(n=8):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        dt = 1e3 * (time.perf_counter() - t_s)
        for h in hs:
            h.get_arrays()
        return dt

    for d in ("/tmp/trace_serve", "/tmp/trace_queue"):
        shutil.rmtree(d, ignore_errors=True)

    qps0 = timed_section()  # settle
    log(f"settle section: {qps0:.0f} QPS")

    jax.profiler.start_trace("/tmp/trace_serve", create_perfetto_trace=True)
    qps = timed_section()
    jax.profiler.stop_trace()
    log(f"traced serving section: {qps:.0f} QPS")

    jax.profiler.start_trace("/tmp/trace_queue", create_perfetto_trace=True)
    dt = queue_n(8)
    jax.profiler.stop_trace()
    log(f"traced queue-8: {dt:.0f}ms total")

    analyze("/tmp/trace_serve", "serve")
    analyze("/tmp/trace_queue", "queue8")
    log(f"done t+{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
