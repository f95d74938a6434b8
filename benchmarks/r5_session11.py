#!/usr/bin/env python
"""Round-3 TPU session 11: bounded scans + streamlined top-k + joint drain.

Three measurements in one process:

1. Phase split re-run on the session-10 shapes after (a) segmented scans
   bounded to log2(NC) steps and (b) 2-reduction top-k.  Session-10
   baselines (same probe code): B=1024/NC=16 sort 6.68 scan 8.15 full
   10.65; B=2048/NC=8 sort 6.05 scan 7.42 full 8.66 ms.
2. Synthetic D2H grouping: per-window fetch cost of slots20-sized buffers
   drained one at a time vs jointly (device concat -> one round trip) in
   groups of 2 and 4, interleaved.
3. Real serving A/B at the 1M-doc bench: drain group 1 vs 2 vs 4 with the
   new kernel, slots20, depth-3 pipeline, interleaved reps.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


P_TOTAL = 7_463_361
C = 1024
CP = C - 128


def synth_rec(rng):
    rec = np.zeros((4, P_TOTAL), np.int32)
    rec[0] = np.arange(P_TOTAL, dtype=np.int32) % (1 << 20)
    rec[1] = rng.integers(1, 4, P_TOTAL, dtype=np.int32)
    rec[2] = np.float32(8.0).view(np.int32)
    rec[3] = 1
    return rec


def synth_tables(rng, B, NC):
    c_start = (rng.integers(0, (P_TOTAL - C) // 128, (B, NC), dtype=np.int32)) * 128
    c_skip = rng.integers(0, 128, (B, NC), dtype=np.int32)
    c_len = np.full((B, NC), CP, np.int32)
    c_qterm = (np.arange(NC, dtype=np.int32) * 3 // NC)[None].repeat(B, 0)
    c_scale = np.ones((B, NC), np.float32)
    return c_start, c_skip, c_len, c_qterm, c_scale


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu.models import bm25 as bm25_mod
    from probly_search_tpu.ops.pallas_query import fused_query_topk

    scorer = bm25_mod.new()
    rng = np.random.default_rng(0)
    rec = jax.device_put(synth_rec(rng))
    scalars = jax.device_put(np.array([[8.0, 1.0]], np.float32))
    out = {}

    def qtime(fn, args, M=12):
        t0 = time.time()
        hs = [fn(*args) for _ in range(M)]
        np.asarray(jax.tree_util.tree_leaves(hs[-1])[0])
        return (time.time() - t0) / M * 1e3

    # ---- part 1: phase split with the new merge -------------------------
    shapes = [(1024, 16), (2048, 8)]
    phases = ["sort", "scan", "full"]
    progs = {}
    for B, NC in shapes:
        tabs = [jax.device_put(a) for a in synth_tables(rng, B, NC)]
        for ph in phases:
            f = jax.jit(
                lambda cs, ck, cl, cq, csc, _ph=ph: fused_query_topk(
                    scorer, rec, cs, ck, cl, cq, csc, scalars,
                    chunk=C, k=10, qterm_bits=4, num_fields=1, phase=_ph,
                )
            )
            t0 = time.time()
            r = f(*tabs)
            np.asarray(r[0])
            log(f"compiled+ran ({B},{NC}) {ph} in {time.time()-t0:.1f}s")
            progs[(B, NC, ph)] = (f, tabs)

    res = {key: [] for key in progs}
    for rep in range(3):
        for key, (f, tabs) in progs.items():
            res[key].append(qtime(f, tabs))
    for B, NC in shapes:
        row = {ph: round(float(np.median(res[(B, NC, ph)])), 2) for ph in phases}
        out[f"phase_ms_B{B}_NC{NC}"] = row
        log(f"B={B} NC={NC}: {row}")

    # ---- part 2: synthetic D2H grouping ---------------------------------
    from probly_search_tpu.index.device import _JOINT_CONCAT

    NBYTES = 425_984  # 16384-query slots20 window (~26 B_out-padded B/q)
    base = jax.device_put(np.zeros(NBYTES, np.int8))
    bump = jax.jit(lambda x, i: x + i)

    def fresh(i):
        return bump(base, np.int8(i % 7 + 1))

    def time_group(g, reps=10):
        # per-WINDOW ms: g fresh buffers -> one joint fetch (g=1: plain)
        ts = []
        for r in range(reps):
            bufs = [fresh(r * 7 + j) for j in range(g)]
            t0 = time.perf_counter()
            if g == 1:
                np.asarray(bufs[0])
            else:
                np.asarray(_JOINT_CONCAT(*bufs))
            ts.append((time.perf_counter() - t0) * 1e3 / g)
        return ts

    for g in (1, 2, 4):  # warm compiles
        time_group(g, reps=2)
    fetch = {g: [] for g in (1, 2, 4)}
    for rep in range(5):
        for g in (1, 2, 4):
            fetch[g].extend(time_group(g, reps=4))
    for g in (1, 2, 4):
        med = float(np.median(fetch[g]))
        out[f"fetch_ms_per_window_g{g}"] = round(med, 2)
        log(f"synthetic fetch group={g}: {med:.2f} ms/window "
            f"(n={len(fetch[g])})")

    # ---- part 3: real serving A/B ---------------------------------------
    import importlib.util
    from concurrent.futures import ThreadPoolExecutor

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from probly_search_tpu import Index, IndexConfig, bm25
    from probly_search_tpu.index.device import fetch_windows_jointly
    from probly_search_tpu.utils.metrics import metrics

    window = 16384
    top_k = 10
    depth = 6  # deep enough to keep the device busy at group=4

    t0 = time.time()
    vocab, cdf, texts = bench.make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = bench.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index built ({time.time() - t0:.0f}s); num_slots={dix.num_slots}")

    tw = time.time()
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"warm ({time.time() - tw:.0f}s)")
    out["warm_s"] = round(time.time() - tw, 1)

    # joint-fetch parity on the real path
    h1 = dix.query_batch_async(windows[0], scorer, top_k=top_k)
    h2 = dix.query_batch_async(windows[1], scorer, top_k=top_k)
    fetch_windows_jointly([h1, h2])
    _, sl1, _ = h1.get_arrays()
    _, sl2, _ = h2.get_arrays()
    _, sl1b, _ = dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
    assert (sl1 == sl1b).all()
    out["joint_parity"] = True
    log("joint-fetch parity ok")

    def section(group, passes=6):
        t1 = time.perf_counter()
        n_total = 0
        pend = []

        def drain(handles):
            fetch_windows_jointly(handles)
            for h in handles:
                h.get_arrays()

        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _ in range(passes):
                for w in windows:
                    pend.append(dix.query_batch_async(w, scorer, top_k=top_k))
                    n_total += len(w)
                    if len(pend) >= group:
                        futs.append(pool.submit(drain, pend))
                        pend = []
                    while len(futs) * group >= depth:
                        futs.pop(0).result()
            if pend:
                futs.append(pool.submit(drain, pend))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t1)

    groups = (1, 2, 4)
    res3 = {g: [] for g in groups}
    phase3 = {g: {} for g in groups}
    for rep in range(5):
        for g in groups:
            metrics.reset()
            q = section(g)
            res3[g].append(q)
            snap = metrics.snapshot()["histograms"]
            for name in ("query/plan", "query/dispatch", "query/drain", "query/fetch"):
                h = snap.get(name)
                if h:
                    phase3[g].setdefault(name, []).append(h["mean_us"] / 1e3)
            log(f"rep {rep} group={g}: {q:.0f} QPS")
    for g in groups:
        med = sorted(res3[g])[len(res3[g]) // 2]
        out[f"qps_g{g}"] = round(med, 1)
        out[f"qps_g{g}_reps"] = [round(q) for q in res3[g]]
        for name, vals in phase3[g].items():
            out[f"{name.split('/')[-1]}_ms_g{g}"] = round(
                sorted(vals)[len(vals) // 2], 2
            )
        log(f"group={g}: {[f'{q:.0f}' for q in res3[g]]} median {med:.0f}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
