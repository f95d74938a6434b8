#!/usr/bin/env python
"""r6 session 3: validate the prefetch+paired-drain serving path end to end,
then hardware-validate the fused z2o kernel's fine NC buckets (committed in
session 12 but never executed on the real Mosaic backend) and measure z2o
QPS with the new drain.

Usage: python benchmarks/r6_session3.py 2>/tmp/s14.log >/tmp/s14.json
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

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from concurrent.futures import ThreadPoolExecutor

    from probly_search_tpu import (
        Index,
        IndexConfig,
        bm25,
        whitespace_tokenizer,
        zero_to_one,
    )

    out = {}

    # ------------------- BM25 1M serving A/B (package paths) -------------
    n_docs, window, top_k = int(1e6), 16384, 10
    t0 = time.time()
    vocab, cdf, texts = bench.make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = bench.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"bm25 setup: {time.time() - t0:.1f}s")
    t0 = time.time()
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"bm25 warm: {time.time() - t0:.1f}s")

    n_passes = 6

    def section_single(depth):
        t5 = time.perf_counter()
        n_total = 0
        done = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    futs.append(pool.submit(lambda h=h: done.append(h.get_arrays())))
                    n_total += len(w)
                    while len(futs) >= depth:
                        futs.pop(0).result()
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5), done[-1]

    def section_paired():
        t5 = time.perf_counter()
        n_total = 0
        done = []

        def drain_pair(pair):
            for h in pair:
                done.append(h.get_arrays())

        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
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
        return n_total / (time.perf_counter() - t5), done[-1]

    modes = ["base", "new"]
    qps = {m: [] for m in modes}
    ref_slots = None
    for rep in range(5):
        for m in modes:
            if m == "base":
                dix.config.prefetch_results = False
                q, (_, slots, _) = section_single(3)
            else:
                dix.config.prefetch_results = True
                q, (_, slots, _) = section_paired()
            qps[m].append(q)
            if ref_slots is None:
                ref_slots = slots
            else:
                assert np.array_equal(slots, ref_slots), f"parity break {m}"
    for m in modes:
        med = sorted(qps[m])[2]
        out[f"bm25_{m}_qps"] = round(med)
        out[f"bm25_{m}_reps"] = [round(v) for v in qps[m]]
        log(f"BM25 {m}: median {med:.0f} QPS  reps {[round(v) for v in qps[m]]}")
    dix.config.prefetch_results = True

    # ------------------- z2o: fused fine-bucket hardware validation ------
    rng = np.random.default_rng(7)
    zvocab = np.array(["w%04d" % i for i in range(4000)])
    zw = 1.0 / np.arange(1, len(zvocab) + 1) ** 1.05
    zcdf = np.cumsum(zw)
    zcdf /= zcdf[-1]

    def ztexts(n, length):
        ids = np.searchsorted(zcdf, rng.random((n, length)))
        return [" ".join(row) for row in zvocab[np.minimum(ids, len(zvocab) - 1)]]

    t0 = time.time()
    zix = Index(2)
    zix.add_documents_columnar(
        list(range(50_000)), [ztexts(50_000, 3), ztexts(50_000, 8)]
    )
    n_zq = 8192
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((n_zq, 2)) * (1.0 - lo))
    zqueries = [
        " ".join(row) for row in zvocab[np.minimum(qids, len(zvocab) - 1)]
    ]
    zdix = zix.device_index()
    log(f"z2o setup: {time.time() - t0:.1f}s")

    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async

    t0 = time.time()
    for s in range(0, n_zq, 2048):
        z2o_query_batch_async(
            zdix, zqueries[s : s + 2048], whitespace_tokenizer, 10, fmt="slots"
        ).get_arrays()
        log(f"z2o warm {s + 2048}/{n_zq} ({time.time() - t0:.0f}s)")
    z2o_query_batch_async(
        zdix, zqueries, whitespace_tokenizer, 10, fmt="slots"
    ).get_arrays()
    log(f"z2o warm full ({time.time() - t0:.0f}s)")

    # Parity vs the exact f64 oracle (hardware Mosaic path).
    sample = zqueries[:24]
    rows = zix.query_batch(sample, zero_to_one.new(), top_k=10, backend="device")
    worst = 0.0
    for q, row in zip(sample, rows):
        oracle = zix.query(
            q, zero_to_one.new(), whitespace_tokenizer, [1.0, 1.0], top_k=10
        )
        assert len(row) == len(oracle), q
        a = sorted(r.score for r in row)
        b = sorted(r.score for r in oracle)
        worst = max(
            worst,
            max(
                (abs(x - y) / max(1e-9, abs(y)) for x, y in zip(a, b)),
                default=0.0,
            ),
        )
    out["z2o_worst_rel_err"] = float(f"{worst:.3e}")
    log(f"z2o parity worst rel err {worst:.2e}")
    assert worst < 1e-4

    def z2o_section(mode):
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for _ in range(n_passes):
                h = z2o_query_batch_async(
                    zdix, zqueries, whitespace_tokenizer, 10, fmt="slots"
                )
                if mode == "base":
                    futs.append(pool.submit(h.get_arrays))
                    while len(futs) >= 3:
                        futs.pop(0).result()
                else:
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
        return n_passes * n_zq / (time.perf_counter() - t1)

    zqps = {"base": [], "new": []}
    for rep in range(5):
        for m in ("base", "new"):
            zdix.config.prefetch_results = m == "new"
            zqps[m].append(z2o_section(m))
    for m in ("base", "new"):
        med = sorted(zqps[m])[2]
        out[f"z2o_{m}_qps"] = round(med)
        out[f"z2o_{m}_reps"] = [round(v) for v in zqps[m]]
        log(f"z2o {m}: median {med:.0f} QPS  reps {[round(v) for v in zqps[m]]}")
    zdix.config.prefetch_results = True

    print(json.dumps(out))


if __name__ == "__main__":
    main()
