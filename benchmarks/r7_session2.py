#!/usr/bin/env python
"""r7 session 2 (hardware): decompose the 50 ms serving window, then A/B
the per-class dispatch mode against the composed window.

Motivation (PERFORMANCE.md r7 session 1c): the bare class score-steps of
the 1M bench window sum to ~12-20 ms on the chip, but bench.py's queue-8
device pace is 50.3 ms/window — ~30 ms of every window is NOT the score
kernels.  Phases:

  T  jax.profiler trace of 3 pipelined composed windows -> per-op ms
     (device track), inter-op gap analysis.
  P  queue-8 device pace with prefetch_results ON vs OFF, interleaved
     (isolates the on-stream D2H transfer share; r6 s4 measured ~11 ms).
  C  warm the per-class mode (compiles: ~16 class programs + 2 pack
     programs; first run pays remote compiles, logged per window).
  T2 trace 3 pipelined per-class windows -> same decomposition.
  AB interleaved steady-state serving sections (bench.py loop shape:
     paired late drains, depth-4) composed vs per-class, 3 sections each,
     plus queue-8 pace per mode; parity spot-check between modes.

Run: one process, pipe to a file.
"""

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus, make_queries  # noqa: E402


def parse_trace(log_dir):
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None, f"no trace.json.gz under {log_dir}"
    path = max(paths, key=len)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    proc_names, rows = {}, []
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
        elif ev.get("ph") == "X":
            rows.append(ev)
    return (proc_names, rows), None


def device_decomp(trace_dir, n_windows):
    parsed, err = parse_trace(trace_dir)
    if err:
        return {"trace_error": err}
    proc_names, rows = parsed
    dev_pids = {
        pid
        for pid, name in proc_names.items()
        if any(s in name.lower() for s in ("tpu", "device", "xla"))
    }
    by_op = collections.Counter()
    spans = []
    for ev in rows:
        if ev["pid"] in dev_pids:
            by_op[ev.get("name", "?")] += ev.get("dur", 0)
            spans.append((ev.get("ts", 0), ev.get("dur", 0)))
    total = sum(by_op.values())
    out = {
        "device_total_ms_per_window": round(total / 1e3 / n_windows, 2),
        "top_ops_ms_per_window": [
            {"op": name[:110], "ms": round(dur / 1e3 / n_windows, 2)}
            for name, dur in by_op.most_common(25)
        ],
    }
    spans.sort()
    if spans:
        merged, cur_s, cur_e = 0, None, None
        for ts, d in spans:
            if cur_e is None or ts > cur_e:
                if cur_e is not None:
                    merged += cur_e - cur_s
                cur_s, cur_e = ts, ts + d
            else:
                cur_e = max(cur_e, ts + d)
        merged += cur_e - cur_s
        wall = max(ts + d for ts, d in spans) - spans[0][0]
        out["device_wall_ms_per_window"] = round(wall / 1e3 / n_windows, 2)
        out["device_busy_ms_per_window"] = round(merged / 1e3 / n_windows, 2)
    for o in out.get("top_ops_ms_per_window", []):
        log(f"  {o['ms']:8.2f} ms  {o['op']}")
    log(
        f"  wall {out.get('device_wall_ms_per_window')} busy "
        f"{out.get('device_busy_ms_per_window')} total {out['device_total_ms_per_window']}"
    )
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu import Index, IndexConfig, bm25

    window, top_k = 16384, 10
    t0 = time.time()
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index+snapshot {time.time() - t0:.0f}s")

    def warm(tag):
        for i, w in enumerate(windows):
            t1 = time.time()
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
            log(f"warm[{tag}] window {i}: {time.time() - t1:.1f}s")

    def queue_n(n):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        return 1e3 * (time.perf_counter() - t_s)

    def pace():
        t1 = min(queue_n(1) for _ in range(2))
        t8 = min(queue_n(8) for _ in range(2))
        return (t8 - t1) / 7.0

    def timed_section(n_passes=4):
        from concurrent.futures import ThreadPoolExecutor

        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    pending.append(h)
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(
                            pool.submit(
                                lambda pr: [x.get_arrays() for x in pr], pending
                            )
                        )
                        pending = []
                    while len(futs) >= 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(lambda pr: [x.get_arrays() for x in pr], pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    out = {}

    # --- phase T: composed-window trace -------------------------------- #
    warm("composed")
    warm("composed")  # settle queues/caches
    trace_dir = "/tmp/jaxtrace_r7s2_composed"
    with jax.profiler.trace(trace_dir):
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(3)
        ]
        for h in hs:
            np.asarray(h._packed)
    log("T: composed trace captured")
    out["T_composed"] = device_decomp(trace_dir, 3)
    print(json.dumps({"phase": "T", **out["T_composed"]}), flush=True)

    # --- phase P: prefetch ON/OFF pace --------------------------------- #
    paces = {True: [], False: []}
    for rep in range(3):
        for pf in (True, False):
            dix.config.prefetch_results = pf
            paces[pf].append(pace())
            log(f"P rep{rep} prefetch={pf}: {paces[pf][-1]:.1f} ms/window")
    dix.config.prefetch_results = True
    out["P"] = {
        "pace_prefetch_ms": sorted(paces[True])[1],
        "pace_noprefetch_ms": sorted(paces[False])[1],
        "reps": {str(k): [round(x, 1) for x in v] for k, v in paces.items()},
    }
    print(json.dumps({"phase": "P", **out["P"]}), flush=True)

    # --- phase C: per-class warm (compiles) ----------------------------- #
    # Parity spot-check between modes on one window while warming.
    base = dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
    dix.config.per_class_dispatch = True
    t1 = time.time()
    warm("per_class")
    log(f"C: per-class warm (incl. compiles) {time.time() - t1:.1f}s")
    pcd = dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
    eq_slots = bool(np.array_equal(base[1], pcd[1]))
    out["C"] = {
        "warm_s": round(time.time() - t1, 1),
        "slots_equal": eq_slots,
    }
    log(f"C: slots equal across modes: {eq_slots}")
    print(json.dumps({"phase": "C", **out["C"]}), flush=True)

    # --- phase T2: per-class trace -------------------------------------- #
    warm("per_class")
    trace_dir = "/tmp/jaxtrace_r7s2_perclass"
    with jax.profiler.trace(trace_dir):
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(3)
        ]
        for h in hs:
            np.asarray(h._packed)
    log("T2: per-class trace captured")
    out["T2_per_class"] = device_decomp(trace_dir, 3)
    print(json.dumps({"phase": "T2", **out["T2_per_class"]}), flush=True)

    # --- phase AB: interleaved serving sections ------------------------- #
    qps = {"composed": [], "per_class": []}
    pcs = {"composed": [], "per_class": []}
    for rep in range(3):
        for mode in ("composed", "per_class"):
            dix.config.per_class_dispatch = mode == "per_class"
            qps[mode].append(timed_section())
            pcs[mode].append(pace())
            log(
                f"AB rep{rep} {mode}: {qps[mode][-1]:.0f} QPS, "
                f"pace {pcs[mode][-1]:.1f} ms/window"
            )
    out["AB"] = {
        m: {
            "qps_median": round(sorted(qps[m])[1], 0),
            "qps_reps": [round(x) for x in qps[m]],
            "pace_median_ms": round(sorted(pcs[m])[1], 1),
            "pace_reps_ms": [round(x, 1) for x in pcs[m]],
        }
        for m in qps
    }
    print(json.dumps({"phase": "AB", **out["AB"]}), flush=True)


if __name__ == "__main__":
    main()
