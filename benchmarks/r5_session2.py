#!/usr/bin/env python
"""Round-3 TPU session 2 (one process; session 1 recorded the BM25 A/B —
slots 163.0k vs compact 160.4k QPS — then died on the fused z2o Mosaic
block-spec bug, now fixed):

A. cheap probe: does the fused z2o Mosaic kernel COMPILE on the real
   toolchain at the serving shapes?  (Remote-compiler size limits are a
   standing hazard — probe before anything depends on it.)
B. zero-to-one 50k/2f interleaved A/B: fused kernel vs staged XLA, plus
   parity vs the f64 oracle.  Staged warms FIRST so a wedged fused
   compile still leaves numbers.
C. heavy-range cache on device: 1M-doc single-char prefix queries cold
   (cache miss -> full device scan) vs warm (host lookup); VERDICT item 3
   wants warm < 100 ms.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from concurrent.futures import ThreadPoolExecutor

    from probly_search_tpu import Index, bm25, whitespace_tokenizer, zero_to_one
    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async
    import probly_search_tpu.index.device as _dev

    out = {}
    depth = 3

    # ---------------- B-prep: z2o 50k/2f corpus -------------------------- #
    rng = np.random.default_rng(7)
    zv = np.array(["w%04d" % i for i in range(4000)])
    zw = 1.0 / np.arange(1, len(zv) + 1) ** 1.05
    zcdf = np.cumsum(zw)
    zcdf /= zcdf[-1]

    def ztexts(n, length):
        ids = np.searchsorted(zcdf, rng.random((n, length)))
        return [" ".join(row) for row in zv[np.minimum(ids, len(zv) - 1)]]

    t0 = time.time()
    zix = Index(2)
    zix.add_documents_columnar(
        list(range(50_000)), [ztexts(50_000, 3), ztexts(50_000, 8)]
    )
    n_queries = 2048
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((n_queries, 2)) * (1.0 - lo))
    zqueries = [" ".join(row) for row in zv[np.minimum(qids, len(zv) - 1)]]
    zdix = zix.device_index()
    log(f"z2o corpus built ({time.time() - t0:.0f}s)")

    def z2o_warm(mode):
        _dev._FUSED_MODE = mode
        tw = time.time()
        for s in range(0, n_queries, 512):
            z2o_query_batch_async(
                zdix, zqueries[s : s + 512], whitespace_tokenizer, 10
            ).get_arrays()
            log(f"z2o[{mode}] warm {s + 512} ({time.time() - tw:.0f}s)")
        z2o_query_batch_async(zdix, zqueries, whitespace_tokenizer, 10).get_arrays()
        log(f"z2o[{mode}] warm full ({time.time() - tw:.0f}s)")

    def z2o_section():
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _ in range(6):
                h = z2o_query_batch_async(zdix, zqueries, whitespace_tokenizer, 10)
                futs.append(pool.submit(h.get_arrays))
                if len(futs) >= depth:
                    futs.pop(0).result()
            for f in futs:
                f.result()
        return 6 * n_queries / (time.perf_counter() - t1)

    # Staged FIRST (numbers survive a wedged fused compile), fused probe
    # second.
    z2o_modes = ["off"]
    z2o_warm("off")
    try:
        t_probe = time.time()
        z2o_warm("auto")
        out["z2o_fused_compile_s"] = round(time.time() - t_probe, 1)
        z2o_modes.append("auto")
    except Exception as e:
        log(f"z2o fused warm FAILED: {e!r:.300s}")
        out["z2o_fused_error"] = repr(e)[:200]

    zres = {m: [] for m in z2o_modes}
    for rep in range(3):
        for mode in z2o_modes:
            _dev._FUSED_MODE = mode
            q = z2o_section()
            zres[mode].append(q)
            log(f"z2o rep {rep} mode={mode}: {q:.0f} QPS")
    for mode in z2o_modes:
        med = sorted(zres[mode])[len(zres[mode]) // 2]
        log(f"z2o mode={mode}: {[f'{q:.0f}' for q in zres[mode]]} median {med:.0f}")
        out[f"z2o_qps_{mode}"] = round(med, 1)
    best_mode = max(z2o_modes, key=lambda m: sorted(zres[m])[len(zres[m]) // 2])
    _dev._FUSED_MODE = best_mode
    out["z2o_best_mode"] = best_mode
    out["z2o_qps"] = out[f"z2o_qps_{best_mode}"]

    # parity vs f64 oracle under the winning mode
    zsample = zqueries[:24]
    rows = zix.query_batch(zsample, zero_to_one.new(), top_k=10, backend="device")
    worst = 0.0
    for q, row in zip(zsample, rows):
        oracle = zix.query(
            q, zero_to_one.new(), whitespace_tokenizer, [1.0, 1.0], top_k=10
        )
        assert len(row) == len(oracle), q
        a = sorted(r.score for r in row)
        b = sorted(r.score for r in oracle)
        worst = max(
            worst,
            max((abs(x - y) / max(1e-9, abs(y)) for x, y in zip(a, b)), default=0.0),
        )
    log(f"z2o parity worst rel err {worst:.2e} (mode={best_mode})")
    assert worst < 1e-4
    out["z2o_worst_rel_err"] = worst
    _dev._FUSED_MODE = "auto"

    # ---------------- C: heavy-range cache on device --------------------- #
    from bench import make_corpus

    t0 = time.time()
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    dix = ix.device_index()
    scorer = bm25.new()
    log(f"1M corpus built ({time.time() - t0:.0f}s)")
    # warm the normal window compositions once (single-query batch class)
    dix.query_batch(["t"], scorer, top_k=10)

    def timed_q(q):
        t1 = time.perf_counter()
        dix.query_batch_async([q], scorer, top_k=10).get_arrays()
        return 1e3 * (time.perf_counter() - t1)

    heavy = {}
    for q in ("t", "t0", "a", "s m"):
        cold = timed_q(q)  # first encounter computes through the device
        warm = [timed_q(q) for _ in range(3)]
        heavy[q] = {"cold_ms": round(cold, 1), "warm_ms": round(min(warm), 1)}
        log(f"heavy {q!r}: cold {cold:.0f}ms warm {min(warm):.0f}ms")
    out["heavy_range"] = heavy
    from probly_search_tpu.utils.metrics import metrics

    snap = metrics.snapshot()["counters"]
    out["heavy_cache_hits"] = snap.get("heavy_cache_hits", 0)
    out["heavy_cache_misses"] = snap.get("heavy_cache_misses", 0)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
