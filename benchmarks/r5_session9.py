#!/usr/bin/env python
"""Round-3 TPU session 9: device trace of the BM25 serving window.

Session 8 put the bind at device compute (~89 ms/window).  This captures
a jax.profiler trace of 3 pipelined windows (works through the tunnel,
CLAUDE.md) and parses the perfetto trace JSON to rank device ops by total
duration — splitting the window among the fused gather+score+merge
kernel, sort/top-k, scan stages, and exposing any inter-op gaps.
"""

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def parse_trace(log_dir):
    """Parse the perfetto/chrome trace: return per-track event lists."""
    paths = glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return None, f"no trace.json.gz under {log_dir}; files: " + str(
            glob.glob(f"{log_dir}/**/*", recursive=True)[:50]
        )
    path = max(paths, key=lambda p: len(p))
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # Map (pid, tid) -> names
    proc_names = {}
    thread_names = {}
    rows = []
    for ev in events:
        ph = ev.get("ph")
        if ph == "M":
            if ev.get("name") == "process_name":
                proc_names[ev["pid"]] = ev["args"].get("name", "")
            elif ev.get("name") == "thread_name":
                thread_names[(ev["pid"], ev.get("tid"))] = ev["args"].get("name", "")
        elif ph == "X":
            rows.append(ev)
    return (proc_names, thread_names, rows), None


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from probly_search_tpu import Index, IndexConfig, bm25

    out = {}
    window = 16384
    top_k = 10

    t0 = time.time()
    vocab, cdf, texts = bench.make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = bench.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index built ({time.time() - t0:.0f}s)")

    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log("warm done")

    trace_dir = "/tmp/jaxtrace"
    with jax.profiler.trace(trace_dir):
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(3)
        ]
        for h in hs:
            np.asarray(h._packed)
    log("trace captured")

    parsed, err = parse_trace(trace_dir)
    if err:
        out["trace_error"] = err
        log(err)
        print(json.dumps(out))
        return
    proc_names, thread_names, rows = parsed
    log(f"processes: {proc_names}")
    tracks = collections.Counter()
    for ev in rows:
        key = (ev["pid"], ev.get("tid"))
        tracks[(proc_names.get(ev["pid"], ""), thread_names.get(key, ""))] += 1
    for (pn, tn), cnt in tracks.most_common(20):
        log(f"track [{pn} / {tn}]: {cnt} events")

    # Device track: pid whose process_name mentions TPU/device.
    dev_pids = {
        pid for pid, name in proc_names.items()
        if any(s in name.lower() for s in ("tpu", "device", "xla"))
    }
    by_op = collections.Counter()
    n_ev = 0
    spans = []
    for ev in rows:
        if ev["pid"] in dev_pids:
            dur = ev.get("dur", 0)
            name = ev.get("name", "?")
            by_op[name] += dur
            n_ev += 1
            spans.append((ev.get("ts", 0), dur, name))
    total = sum(by_op.values())
    log(f"device events: {n_ev}, total {total/1e3:.1f} ms")
    out["device_total_ms"] = round(total / 1e3, 1)
    top = by_op.most_common(30)
    out["top_ops"] = [
        {"op": name[:120], "ms": round(dur / 1e3, 2)} for name, dur in top
    ]
    for name, dur in top:
        log(f"  {dur/1e3:9.2f} ms  {name[:110]}")

    # Gap analysis on the device track: idle between consecutive spans.
    spans.sort()
    if spans:
        t_start = spans[0][0]
        t_end = max(ts + d for ts, d, _ in spans)
        busy = sum(d for _, d, _ in spans)
        # busy may double-count overlapping sub-spans; also compute merged.
        merged = 0
        cur_s, cur_e = None, None
        for ts, d, _ in spans:
            if cur_e is None or ts > cur_e:
                if cur_e is not None:
                    merged += cur_e - cur_s
                cur_s, cur_e = ts, ts + d
            else:
                cur_e = max(cur_e, ts + d)
        if cur_e is not None:
            merged += cur_e - cur_s
        out["device_span_ms"] = round((t_end - t_start) / 1e3, 1)
        out["device_busy_merged_ms"] = round(merged / 1e3, 1)
        log(
            f"device wall {out['device_span_ms']}ms, merged busy "
            f"{out['device_busy_merged_ms']}ms over 3 windows"
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
