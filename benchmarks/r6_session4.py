#!/usr/bin/env python
"""r6 session 4: post-prefetch decomposition + next-bind probes.

With the drain RTT off the critical path (session 13/14), the BM25 period
is ~60 ms vs device ~50.5 — where is the residual?  And z2o serves 8192-
query windows; does a 16384 composition compile and win?

  S1. Device pace (queue-N marginal) with prefetch ON vs OFF — do the
      background D2H streams steal device time?
  S2. Serving-loop microtimers: per-window read wait, decode+assemble,
      main-thread submit breakdown; how often a read finds the copy
      NOT yet landed?
  S3. z2o 16384-query window: compile probe, then interleaved A/B vs
      2x8192 if it compiles.
  S4. Chunk width C=512 re-probe under fine buckets + stride-C (the
      C=1024-beats-512 falsification predates both).

Usage: python benchmarks/r6_session4.py 2>/tmp/s15.log >/tmp/s15.json
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from concurrent.futures import ThreadPoolExecutor

    from probly_search_tpu import (
        Index, IndexConfig, bm25, whitespace_tokenizer,
    )
    from probly_search_tpu.utils.metrics import metrics

    out = {}
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
    t0 = time.time()
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"warm: {time.time() - t0:.1f}s")

    # ---------------- S1: device pace, prefetch on/off -------------------
    def queue_n(n):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        return 1e3 * (time.perf_counter() - t_s)

    for pf in (True, False):
        dix.config.prefetch_results = pf
        t1 = min(queue_n(1) for _ in range(2))
        t8 = min(queue_n(8) for _ in range(2))
        pace = (t8 - t1) / 7.0
        out[f"s1_pace_prefetch_{pf}"] = round(pace, 1)
        log(f"S1 prefetch={pf}: device {pace:.1f} ms/window (T1 {t1:.0f} T8 {t8:.0f})")
    dix.config.prefetch_results = True

    # ---------------- S2: serving-loop microtimers -----------------------
    n_passes = 6
    reads, decodes, submits = [], [], []

    def drain_pair(pair):
        for h in pair:
            t = time.perf_counter()
            np.asarray(h._packed)
            reads.append(1e3 * (time.perf_counter() - t))
            t = time.perf_counter()
            h.get_arrays()
            decodes.append(1e3 * (time.perf_counter() - t))

    def section_instrumented():
        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    t = time.perf_counter()
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    submits.append(1e3 * (time.perf_counter() - t))
                    pending.append(h)
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(pool.submit(drain_pair, pending))
                        pending = []
                    while len(futs) >= 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(drain_pair, pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    metrics.reset()
    qps = [section_instrumented() for _ in range(3)]
    med = sorted(qps)[1]

    def stats(v):
        v = sorted(v)
        return {
            "p50": round(v[len(v) // 2], 2),
            "p90": round(v[int(len(v) * 0.9)], 2),
            "max": round(v[-1], 2),
            "mean": round(sum(v) / len(v), 2),
        }

    out["s2_qps"] = round(med)
    out["s2_read_ms"] = stats(reads)
    out["s2_decode_ms"] = stats(decodes)
    out["s2_submit_ms"] = stats(submits)
    out["s2_slow_reads"] = sum(1 for r in reads if r > 5.0)
    log(
        f"S2: {med:.0f} QPS  reads {out['s2_read_ms']}  decode "
        f"{out['s2_decode_ms']}  submit {out['s2_submit_ms']}  "
        f"slow reads {out['s2_slow_reads']}/{len(reads)}"
    )

    # ---------------- S3: z2o 16384-query window -------------------------
    rng = np.random.default_rng(7)
    zvocab = np.array(["w%04d" % i for i in range(4000)])
    zw = 1.0 / np.arange(1, len(zvocab) + 1) ** 1.05
    zcdf = np.cumsum(zw)
    zcdf /= zcdf[-1]

    def ztexts(n, length):
        ids = np.searchsorted(zcdf, rng.random((n, length)))
        return [" ".join(row) for row in zvocab[np.minimum(ids, len(zvocab) - 1)]]

    zix = Index(2)
    zix.add_documents_columnar(
        list(range(50_000)), [ztexts(50_000, 3), ztexts(50_000, 8)]
    )
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((16384, 2)) * (1.0 - lo))
    zq = [" ".join(row) for row in zvocab[np.minimum(qids, len(zvocab) - 1)]]
    zdix = zix.device_index()

    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async

    t0 = time.time()
    for s in range(0, 16384, 2048):
        z2o_query_batch_async(
            zdix, zq[s : s + 2048], whitespace_tokenizer, 10, fmt="slots"
        ).get_arrays()
    for s in range(0, 16384, 8192):
        z2o_query_batch_async(
            zdix, zq[s : s + 8192], whitespace_tokenizer, 10, fmt="slots"
        ).get_arrays()
    log(f"z2o warm 2048/8192 shapes: {time.time() - t0:.0f}s")
    t0 = time.time()
    try:
        z2o_query_batch_async(
            zdix, zq, whitespace_tokenizer, 10, fmt="slots"
        ).get_arrays()
        log(f"z2o 16384 compile+run: {time.time() - t0:.0f}s")
        ok16 = True
    except Exception as e:
        out["s3_error"] = repr(e)[:200]
        log(f"z2o 16384 failed: {e!r}")
        ok16 = False

    def z2o_section(wsize):
        nw = 16384 // wsize
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for _ in range(n_passes):
                for wi in range(nw):
                    h = z2o_query_batch_async(
                        zdix,
                        zq[wi * wsize : (wi + 1) * wsize],
                        whitespace_tokenizer,
                        10,
                        fmt="slots",
                    )
                    pending.append(h)
                    if len(pending) == 2:
                        futs.append(
                            pool.submit(
                                lambda ps=pending: [p.get_arrays() for p in ps]
                            )
                        )
                        pending = []
                    while len(futs) >= 2:
                        futs.pop(0).result()
            for h in pending:
                futs.append(pool.submit(h.get_arrays))
            for f in futs:
                f.result()
        return n_passes * 16384 / (time.perf_counter() - t1)

    if ok16:
        zqps = {8192: [], 16384: []}
        for rep in range(5):
            for wsize in (8192, 16384):
                zqps[wsize].append(z2o_section(wsize))
        for wsize in (8192, 16384):
            medz = sorted(zqps[wsize])[2]
            out[f"s3_z2o_w{wsize}_qps"] = round(medz)
            out[f"s3_z2o_w{wsize}_reps"] = [round(v) for v in zqps[wsize]]
            log(f"S3 z2o w={wsize}: median {medz:.0f} QPS {[round(v) for v in zqps[wsize]]}")

    # ---------------- S4: chunk width 512 under fine buckets -------------
    # (last: an unknown-shape remote compile can hang for >45 min)
    t0 = time.time()
    ix2 = Index(
        1, config=IndexConfig(result_format="slots20", chunk_size=512)
    )
    ix2.add_documents_columnar(list(range(n_docs)), [texts])
    dix2 = ix2.device_index()
    log(f"S4 C=512 snapshot: {time.time() - t0:.1f}s; warming (compiles)")
    t0 = time.time()
    try:
        for w in windows:
            dix2.query_batch_async(w, scorer, top_k=top_k).get_arrays()
        log(f"S4 warm: {time.time() - t0:.1f}s")

        def pace_of(d):
            def qn(n):
                t_s = time.perf_counter()
                hs = [
                    d.query_batch_async(windows[i % 2], scorer, top_k=top_k)
                    for i in range(n)
                ]
                np.asarray(hs[-1]._packed)
                return 1e3 * (time.perf_counter() - t_s)

            t1 = min(qn(1) for _ in range(2))
            t8 = min(qn(8) for _ in range(2))
            return (t8 - t1) / 7.0

        # Interleaved pace A/B (device-bound regime: pace IS the metric).
        paces = {"c1024": [], "c512": []}
        for rep in range(3):
            paces["c1024"].append(pace_of(dix))
            paces["c512"].append(pace_of(dix2))
        for k2, v in paces.items():
            out[f"s4_pace_{k2}"] = round(sorted(v)[1], 1)
            log(f"S4 {k2}: {sorted(v)[1]:.1f} ms/window {[round(x,1) for x in v]}")
        # Parity spot check between widths.
        _, sl1, k1 = dix.query_batch_async(windows[0][:256], scorer, top_k=top_k).get_arrays()
        _, sl2, k2_ = dix2.query_batch_async(windows[0][:256], scorer, top_k=top_k).get_arrays()
        assert np.array_equal(k1, k2_), "C=512 ranking mismatch"
        out["s4_parity"] = "equal"
    except Exception as e:  # compile wall — record and move on
        out["s4_error"] = repr(e)[:200]
        log(f"S4 failed: {e!r}")
    del dix2, ix2

    print(json.dumps(out))


if __name__ == "__main__":
    main()
