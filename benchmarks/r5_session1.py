#!/usr/bin/env python
"""Round-3 TPU session 1 (one process — every new python process pays
~100-250 s before its first TPU dispatch, CLAUDE.md):

A. interleaved A/B: slots int8 drain vs compact int16 at the headline
   serving shape (1M docs, 16384-query windows, depth-3) — VERDICT item 1.
B. ranking parity slots == compact == f32 on a window sample.
C. zero-to-one 50k/2f QPS with the fields-as-values fast program
   (VERDICT items 2/6 groundwork) + parity vs the f64 oracle.

Per-phase means are logged per mode so the plan-cache effect (item 5) is
visible in the same run.
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
    from bench import make_corpus, make_queries
    from probly_search_tpu import Index, bm25, whitespace_tokenizer
    from probly_search_tpu.utils.metrics import metrics

    window, n_windows, n_passes, top_k, depth = 16384, 2, 4, 10, 3
    t0 = time.time()
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    log(f"build: {time.time() - t0:.1f}s")
    queries = make_queries(vocab, cdf, window * n_windows, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()

    from concurrent.futures import ThreadPoolExecutor

    def timed_section():
        t0 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    futs.append(pool.submit(h.get_arrays))
                    n_total += len(w)
                    if len(futs) >= depth:
                        futs.pop(0).result()
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t0)

    modes = ("compact", "slots")
    for fmt in modes:
        dix.config.result_format = fmt
        tw = time.time()
        dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
        dix.query_batch_async(windows[1], scorer, top_k=top_k).get_arrays()
        log(f"warm fmt={fmt} done ({time.time() - tw:.1f}s)")

    res = {m: [] for m in modes}
    phase = {m: {} for m in modes}
    for rep in range(4):
        for fmt in modes:
            dix.config.result_format = fmt
            metrics.reset()
            q = timed_section()
            res[fmt].append(q)
            snap = metrics.snapshot()
            for name, h in snap["histograms"].items():
                phase[fmt].setdefault(name, []).append(h["mean_us"] / 1e3)
            log(f"rep {rep} fmt={fmt}: {q:.0f} QPS")

    out = {}
    for fmt in modes:
        med = sorted(res[fmt])[len(res[fmt]) // 2]
        ph = {n: round(float(np.median(v)), 1) for n, v in phase[fmt].items()}
        log(f"fmt={fmt}: {[f'{q:.0f}' for q in res[fmt]]} median {med:.0f} phases {ph}")
        out[f"bm25_qps_{fmt}"] = round(med, 1)
        out[f"phases_{fmt}"] = ph

    # B. ranking parity across formats
    sample = windows[0][:256]
    dix.config.result_format = "f32"
    sf, lf, kf = dix.query_batch_async(sample, scorer, top_k=top_k).get_arrays()
    dix.config.result_format = "compact"
    sc, lc, kc = dix.query_batch_async(sample, scorer, top_k=top_k).get_arrays()
    dix.config.result_format = "slots"
    ss, ls, ks = dix.query_batch_async(sample, scorer, top_k=top_k).get_arrays()
    m = np.isfinite(sf)
    assert (np.isfinite(sf) == np.isfinite(sc)).all()
    assert (lf[m] == lc[m]).all()
    assert ss is None
    assert (ls == np.where(m, lf, -1)).all()
    log("format parity OK (identical rankings)")

    # C. zero-to-one with the fields-as-values fast program
    rng = np.random.default_rng(7)
    zv = np.array(["w%04d" % i for i in range(4000)])
    zw = 1.0 / np.arange(1, len(zv) + 1) ** 1.05
    zcdf = np.cumsum(zw)
    zcdf /= zcdf[-1]

    def ztexts(n, length):
        ids = np.searchsorted(zcdf, rng.random((n, length)))
        return [" ".join(row) for row in zv[np.minimum(ids, len(zv) - 1)]]

    zix = Index(2)
    zix.add_documents_columnar(list(range(50_000)), [ztexts(50_000, 3), ztexts(50_000, 8)])
    n_queries = 2048
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((n_queries, 2)) * (1.0 - lo))
    zqueries = [" ".join(row) for row in zv[np.minimum(qids, len(zv) - 1)]]
    from probly_search_tpu import zero_to_one
    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async

    import probly_search_tpu.index.device as _dev

    zdix = zix.device_index()

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

    # Interleaved A/B: fused kernel (auto) vs staged XLA (off).  The fused
    # Mosaic program is new on this toolchain — degrade to staged-only if
    # its remote compile fails.
    z2o_modes = ["off", "auto"]
    try:
        z2o_warm("auto")
    except Exception as e:  # Mosaic/remote-compile failure: record + drop
        log(f"z2o fused warm FAILED: {e!r:.300s}")
        out["z2o_fused_error"] = repr(e)[:200]
        z2o_modes = ["off"]
    z2o_warm("off")

    zres = {m: [] for m in z2o_modes}
    for rep in range(3):
        for mode in z2o_modes:
            _dev._FUSED_MODE = mode
            q = z2o_section()
            zres[mode].append(q)
            log(f"z2o rep {rep} mode={mode}: {q:.0f} QPS")
    metrics.reset()
    for mode in z2o_modes:
        med = sorted(zres[mode])[len(zres[mode]) // 2]
        log(f"z2o mode={mode}: {[f'{q:.0f}' for q in zres[mode]]} median {med:.0f}")
        out[f"z2o_qps_{mode}"] = round(med, 1)
    best_mode = max(z2o_modes, key=lambda m: sorted(zres[m])[len(zres[m]) // 2])
    _dev._FUSED_MODE = best_mode
    out["z2o_best_mode"] = best_mode
    out["z2o_qps"] = out[f"z2o_qps_{best_mode}"]

    # z2o parity vs f64 oracle
    zsample = zqueries[:24]
    rows = zix.query_batch(zsample, zero_to_one.new(), top_k=10, backend="device")
    worst = 0.0
    for q, row in zip(zsample, rows):
        oracle = zix.query(q, zero_to_one.new(), whitespace_tokenizer, [1.0, 1.0], top_k=10)
        assert len(row) == len(oracle), q
        a = sorted(r.score for r in row)
        b = sorted(r.score for r in oracle)
        worst = max(
            worst,
            max((abs(x - y) / max(1e-9, abs(y)) for x, y in zip(a, b)), default=0.0),
        )
    log(f"z2o parity worst rel err {worst:.2e}")
    assert worst < 1e-4
    out["z2o_worst_rel_err"] = worst

    print(json.dumps(out))


if __name__ == "__main__":
    main()
