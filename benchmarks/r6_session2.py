#!/usr/bin/env python
"""r6 session 2: D2H RTT amortization probes + serving drain-mode A/B.

Context (PERFORMANCE.md session 12): serving is fetch-bound again —
period ~63.5 ms vs device 50.5 ms; per-window fetch = RTT ~30 ms +
~27 ms transfer (slots20, 415 KB).  The transfer already overlaps device
compute (session 11), so the only term above device pace is the per-fetch
RTT.  Three questions, one process:

  P1. Do multi-buffer host-side fetches of FINISHED buffers batch the
      RTT — jax.device_get([a, b]) vs sequential np.asarray vs
      copy_to_host_async-then-read?
  P2. Does copy_to_host_async() issued while the device is BUSY start the
      D2H in the background (later read ~free), or is it a no-op on this
      tunnel runtime?
  P3. Steady-state serving A/B (interleaved, one process): baseline drain
      vs submit-time async prefetch vs paired drains (device_get pairs /
      async pairs).

Usage: python benchmarks/r6_session2.py 2>/tmp/s13.log >/tmp/s13.json
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # corpus/query generators (guarded main)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu import Index, IndexConfig, bm25

    n_docs, window, top_k = int(1e6), 16384, 10
    t0 = time.time()
    vocab, cdf, texts = bench.make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = bench.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"setup: {time.time() - t0:.1f}s")

    # Warm every composition (persistent cache -> fast).
    t0 = time.time()
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"warm: {time.time() - t0:.1f}s")

    out = {}

    def submit(i):
        return dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)

    # Tiny sentinel: wait for all queued executions without fetching the
    # big buffers (executions serialize in submission order).
    sent = jax.jit(lambda x: jnp.sum(x.reshape(-1)[:8].astype(jnp.int32)))

    def sync_on(h):
        np.asarray(sent(h._packed))

    # ---------------- P1: fetch modes on finished buffers ----------------
    def finished(n):
        hs = [submit(i) for i in range(n)]
        sync_on(hs[-1])
        return hs

    def t_seq(hs):
        t = time.perf_counter()
        for h in hs:
            np.asarray(h._packed)
        return 1e3 * (time.perf_counter() - t)

    def t_devget(hs):
        t = time.perf_counter()
        jax.device_get([h._packed for h in hs])
        return 1e3 * (time.perf_counter() - t)

    def t_async(hs):
        t = time.perf_counter()
        for h in hs:
            h._packed.copy_to_host_async()
        t_issue = 1e3 * (time.perf_counter() - t)
        for h in hs:
            np.asarray(h._packed)
        return 1e3 * (time.perf_counter() - t), t_issue

    for g in (1, 2, 4):
        res = {"seq": [], "devget": [], "async": [], "async_issue": []}
        for rep in range(5):
            res["seq"].append(t_seq(finished(g)))
            res["devget"].append(t_devget(finished(g)))
            a, ai = t_async(finished(g))
            res["async"].append(a)
            res["async_issue"].append(ai)
        med = {k: round(sorted(v)[2], 1) for k, v in res.items()}
        out[f"p1_g{g}"] = med
        log(f"P1 g={g}: {med} (ms total for {g} buffers)")

    # ---- P1b: async issued, host sleeps, then read (is the copy done?) --
    rows = []
    for rep in range(3):
        hs = finished(2)
        for h in hs:
            h._packed.copy_to_host_async()
        time.sleep(0.4)
        t = time.perf_counter()
        for h in hs:
            np.asarray(h._packed)
        rows.append(1e3 * (time.perf_counter() - t))
    out["p1b_read_after_sleep_ms"] = round(sorted(rows)[1], 1)
    log(f"P1b read-after-sleep (2 bufs): {out['p1b_read_after_sleep_ms']} ms {rows}")

    # ------------- P2: async prefetch issued while device busy ----------
    def p2(prefetch):
        hA = submit(0)
        if prefetch:
            hA._packed.copy_to_host_async()
        hB = submit(1)
        hC = submit(0)
        sync_on(hC)  # device drained; A's copy had ~2 windows to stream
        t = time.perf_counter()
        np.asarray(hA._packed)
        dt = 1e3 * (time.perf_counter() - t)
        np.asarray(hB._packed)
        np.asarray(hC._packed)
        return dt

    for name, pf in (("p2_noprefetch", False), ("p2_prefetch", True)):
        vals = [p2(pf) for _ in range(5)]
        out[name] = round(sorted(vals)[2], 1)
        log(f"{name}: {out[name]} ms {[round(v, 1) for v in vals]}")

    # ------------- P3: steady-state serving A/B (interleaved) -----------
    from concurrent.futures import ThreadPoolExecutor

    n_passes = 6

    def section(mode):
        depth = 4 if mode.startswith("pair") else 3
        t5 = time.perf_counter()
        n_total = 0
        done = []

        def drain1(h):
            done.append(h.get_arrays())

        def drain2(h1, h2):
            if mode == "pair_devget":
                a, b = jax.device_get([h1._packed, h2._packed])
                h1._packed_host, h2._packed_host = a, b
            else:  # pair_async
                h1._packed.copy_to_host_async()
                h2._packed.copy_to_host_async()
                np.asarray(h1._packed)
                np.asarray(h2._packed)
            done.append(h1.get_arrays())
            done.append(h2.get_arrays())

        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            pending_pair = []
            for p in range(n_passes):
                for i in range(2):
                    h = submit(i)
                    if mode == "async1":
                        h._packed.copy_to_host_async()
                    n_total += window
                    if mode.startswith("pair"):
                        pending_pair.append(h)
                        if len(pending_pair) == 2:
                            futs.append(pool.submit(drain2, *pending_pair))
                            pending_pair = []
                    else:
                        futs.append(pool.submit(drain1, h))
                    while len(futs) >= depth:
                        futs.pop(0).result()
            for h in pending_pair:
                futs.append(pool.submit(drain1, h))
            for f in futs:
                f.result()
        qps = n_total / (time.perf_counter() - t5)
        return qps, done[-1]

    modes = ["base", "async1", "pair_devget", "pair_async"]
    qps = {m: [] for m in modes}
    ref_slots = None
    for rep in range(5):
        for m in modes:
            q, (_, slots, _) = section(m)
            qps[m].append(q)
            if ref_slots is None:
                ref_slots = slots
            else:
                assert np.array_equal(slots, ref_slots), f"parity break {m}"
    for m in modes:
        med = sorted(qps[m])[2]
        out[f"p3_{m}_qps"] = round(med)
        out[f"p3_{m}_reps"] = [round(v) for v in qps[m]]
        log(f"P3 {m}: median {med:.0f} QPS  reps {[round(v) for v in qps[m]]}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
