#!/usr/bin/env python
"""Headline benchmark: BM25 top-10 query throughput at 1M documents, 1 chip.

Workload (north star from BASELINE.json / BASELINE.md):
  * corpus: 1,000,000 single-field docs, 8 tokens each, 50k-term vocabulary
    with Zipf(1.07) frequencies — realistic power-law posting skew.
  * queries: 3 terms each, Zipf-sampled with the top 100 ranks excluded
    (standard stopword removal; without it any engine that scores every
    posting is measuring stopword bandwidth, not search).
  * serving shape: 16384-query windows submitted through the async API
    with a depth-3 pipeline (host planning and result fetches overlap
    device work), top-10, BM25.

The reference (quantleaf/probly-search) publishes no numbers and has no
query benchmark at all (BASELINE.md); the target is the driver's north star
of 100k QPS/chip, so vs_baseline = QPS / 100_000.

Prints exactly one JSON line on stdout (QPS headline plus p50/p99 window
latency and recall fields); diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_corpus(n_docs, vocab_size, doc_len, seed=0):
    rng = np.random.default_rng(seed)
    vocab = np.array(["t%05d" % i for i in range(vocab_size)])
    weights = 1.0 / np.arange(1, vocab_size + 1) ** 1.07
    cdf = np.cumsum(weights)
    cdf /= cdf[-1]
    ids = np.searchsorted(cdf, rng.random((n_docs, doc_len)))
    texts = [" ".join(row) for row in vocab[ids]]
    return vocab, cdf, texts


def make_queries(vocab, cdf, n_queries, terms_per_query, stop_ranks=100, seed=1):
    rng = np.random.default_rng(seed)
    lo = cdf[stop_ranks - 1]
    ids = np.searchsorted(cdf, lo + rng.random((n_queries, terms_per_query)) * (1.0 - lo))
    ids = np.minimum(ids, len(vocab) - 1)
    return [" ".join(row) for row in vocab[ids]]


def main():
    n_docs = int(1e6)
    window = 16384
    n_windows = 2
    # 48 windows per timed section: each section carries ONE pipeline
    # fill + final-drain boundary (~70 ms fixed — first window's device
    # start lags the first submit, the last pair drains after the device
    # goes idle).  r8 session 11 traced the serving loop: the device
    # track is 100% busy mid-section (zero gaps >= 1 ms), so short
    # sections under-reported steady-state throughput by fixed/N —
    # 12-window sections read ~6 ms/window high (301k vs the 48.4
    # ms/window pace).  48 windows cuts the boundary share to ~1.5
    # ms/window while one section (~2.4 s) still sits well inside one
    # tunnel-weather regime (swings are minute-scale).
    n_passes = 24
    top_k = 10
    pipeline_depth = 4  # 2 pairs in flight (paired late drains; see below)

    import threading

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # Zero-traffic cold start, part 1 (VERDICT r4 item 2): a fresh process
    # pays ~100-250 s of tunnel-session init before its FIRST device
    # execute (CLAUDE.md) — pay it in the background, overlapped with the
    # host-bound corpus gen + index build below, instead of inside the
    # first warmup window.
    def _tpu_first_execute():
        import jax.numpy as _jnp

        log(f"devices: {jax.devices()}")
        np.asarray(jax.jit(lambda x: x + 1)(_jnp.zeros(8, _jnp.int32)))
        log(f"tpu session init done at t+{time.time() - t0:.1f}s")

    t0 = time.time()
    init_thread = threading.Thread(target=_tpu_first_execute, daemon=True)
    init_thread.start()
    from probly_search_tpu import Index, bm25, whitespace_tokenizer
    from probly_search_tpu.utils.metrics import metrics

    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    t1 = time.time()
    log(f"corpus gen: {t1 - t0:.1f}s")

    from probly_search_tpu import IndexConfig

    # Serving mode: slots20 nibble-packed result format — 25 B fetched per
    # query (the entropy floor for top-10 of 1M docs) vs 30 (slots) / 60
    # (compact) / 80 (f32).  The drain fetch is the serving pace-setter
    # (PERFORMANCE.md: ~30-40 ms fixed + ~65 us/KB through the tunnel), so
    # drained bytes set the QPS ceiling; slots20 won its interleaved A/B
    # 167.2k vs 155.1k (r5 session 7).  Parity policy: rankings are
    # computed on device in f32 identically in every mode; slots modes drop
    # only the score REPORT (the recall check below uses ranked keys).  The
    # parity suites and the default API keep f32.
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    t2 = time.time()
    log(f"bulk index build: {t2 - t1:.1f}s ({n_docs / (t2 - t1):.0f} docs/s)")

    queries = make_queries(vocab, cdf, window * n_windows, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    init_thread.join()  # device snapshot upload wants a warm session
    dix = ix.device_index()
    t3 = time.time()
    log(f"device snapshot: {t3 - t2:.1f}s")

    # Zero-traffic cold start, part 2 (VERDICT r4 item 2): the checked-in
    # template manifest (tools/freeze_bench_templates.py regenerates it;
    # corpus-deterministic, so live traffic hits the frozen layout and
    # never re-freezes) + prewarm compiles the stream's ONE window program
    # before the first query — a ~0.1 s persistent-cache load once any
    # earlier process on this machine compiled it, vs. paying a remote
    # compile inside the first serving window.  README "Production cold
    # start" documents the same recipe for real deployments.
    import os

    manifest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "bench_templates.json")
    if os.path.exists(manifest):
        n_tpl = dix.load_templates(manifest)
        n_warm = dix.prewarm(scorer)
        t_pw = time.time()
        log(f"prewarm: {n_tpl} template(s), {n_warm} program(s) in {t_pw - t3:.1f}s")

    # Warmup pass: two settle passes through the full pipeline (plan-pool
    # build for the query stream's terms, queue/cache settling).  With the
    # manifest prewarm above, no window-program compile happens here.
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    t4 = time.time()
    warmup_s = t4 - t3
    log(f"warmup (incl. prewarm): {warmup_s:.1f}s")

    # Timed: async submission with a depth-4 pipeline and a background
    # drain thread that reads windows in PAIRS, one window late.  Submit
    # issues copy_to_host_async on the packed result (prefetch_results),
    # so the D2H streams behind later windows' device compute; draining a
    # pair after two more submissions guarantees the async copies have
    # fully landed, so each read is ~0.1 ms instead of the tunnel's ~37 ms
    # sync+fetch round trip (r6 session 2 A/B: 240.2k -> 277.1k QPS).
    # The tunnel's throughput swings minute to minute, so seven timed
    # sections are sampled and the MEDIAN section is reported (all seven
    # go into the JSON for transparency).
    from concurrent.futures import ThreadPoolExecutor

    metrics.reset()
    lat_ms = []
    results_box = []

    def drain_pair(pair):
        for t_submit, h in pair:
            out = h.get_arrays()
            lat_ms.append(1e3 * (time.perf_counter() - t_submit))
            results_box.append(out)

    def timed_section():
        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            pending = []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    pending.append((time.perf_counter(), h))
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(pool.submit(drain_pair, pending))
                        pending = []
                    while len(futs) >= pipeline_depth // 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(drain_pair, pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    n_sections = 7  # median of 7 (tunnel swings +-20%; VERDICT r4 item 5)
    sections = []
    for s in range(n_sections):
        sections.append(timed_section())
        log(f"timed section {s}: {sections[-1]:.0f} QPS")
    qps = sorted(sections)[n_sections // 2]
    scores_out, slots_out, keys_out = results_box[-1]
    assert slots_out.shape == (window, top_k) and keys_out.shape == (window, top_k)
    assert scores_out is None  # slots-only serving mode carries no scores
    assert (slots_out[0] >= 0).any()
    lat_ms = sorted(lat_ms)
    p50 = lat_ms[len(lat_ms) // 2]
    p99 = lat_ms[min(len(lat_ms) - 1, int(len(lat_ms) * 0.99))]
    log(
        f"timed: median {qps:.0f} QPS over {n_sections} sections; "
        f"window latency p50 {p50:.0f}ms p99 {p99:.0f}ms ({len(lat_ms)} windows)"
    )
    snap = metrics.snapshot()
    for name, h in sorted(snap["histograms"].items()):
        log(
            f"  phase {name:22s} n={h['count']:3d} mean={h['mean_us'] / 1e3:8.2f}ms "
            f"total={h['count'] * h['mean_us'] / 1e3:8.1f}ms"
        )

    def phase_ms(name):
        h = snap["histograms"].get(name)
        return round(h["mean_us"] / 1e3, 2) if h else None

    # Weather-invariant companions to the QPS sample (VERDICT r2 weak #5):
    # per-window phase means, drained bytes, and a synchronous window time
    # (plan+pack+device+fetch with no pipeline) so the recorded number can
    # be read against tunnel conditions.
    sync_ms = []
    for _ in range(3):
        t_s = time.perf_counter()
        dix.query_batch_async(windows[0], scorer, top_k=top_k).get_arrays()
        sync_ms.append(1e3 * (time.perf_counter() - t_s))
    sync_window_ms = sorted(sync_ms)[1]
    log(f"sync window (no pipeline): {sync_window_ms:.0f}ms {sync_ms}")

    # Device pace (weather-invariant): queue N windows, one sync —
    # executions serialize on the device (PERFORMANCE.md r5 session 8), so
    # the marginal window cost is pure device compute, independent of the
    # tunnel's RTT/throughput weather.
    def queue_n(n):
        # One sync at the end (fetch the LAST window only): executions run
        # in submission order, so the final fetch waits for all n.
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % len(windows)], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        return 1e3 * (time.perf_counter() - t_s)

    t1w = min(queue_n(1) for _ in range(2))
    t8w = min(queue_n(8) for _ in range(2))
    device_ms_per_window = (t8w - t1w) / 7.0
    log(f"device pace: {device_ms_per_window:.1f} ms/window (T1 {t1w:.0f}, T8 {t8w:.0f})")

    # Weather-normalized ceiling (VERDICT r4 item 5): the pipeline model's
    # steady-state pace is the marginal per-window device-stream cost —
    # and because prefetch_results (the package default) enqueues each
    # window's D2H copy on the device stream at submit time, the queue-8
    # measurement above ALREADY carries one on-stream drain per window
    # (~26 us/KB — PERFORMANCE.md r6 session 4; an earlier version of
    # this field added it again and produced a "ceiling" below measured
    # QPS, r8 session 4).  Host planning and the drain's blocking reads
    # are hidden by the pipeline.  This field moves only with engine
    # changes, never with tunnel weather, so a reader can separate
    # regressions from weather at a glance: healthy headline QPS is this
    # ceiling minus serving-loop slack; a ceiling drop is an engine
    # regression even in good weather.
    drained_bytes_per_query = 2 * top_k + (top_k + 1) // 2  # slots20
    qps_model_ceiling = window / (device_ms_per_window / 1e3)
    spread = (max(sections) - min(sections)) / qps
    log(
        f"model ceiling: {qps_model_ceiling:.0f} QPS "
        f"(device-stream pace {device_ms_per_window:.1f} ms/window incl. "
        f"on-stream drain); section spread {spread:.2f}"
    )

    # Recall vs the exact f64 oracle on a 256-query sample (ranked keys
    # from the slots-only drain — the same surface the timed loop serves).
    sample = queries[:256]
    _s, s_slots, s_keys = dix.query_batch_async(
        sample, scorer, top_k=top_k
    ).get_arrays()
    hits = total = 0
    for qi, q in enumerate(sample):
        oracle = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:top_k]
        o_keys = {r.key for r in oracle}
        d_keys = {int(k) for k, sl in zip(s_keys[qi], s_slots[qi]) if sl >= 0}
        hits += len(o_keys & d_keys)
        total += len(o_keys)
    recall = hits / max(total, 1)
    log(f"recall@{top_k} vs oracle on {len(sample)} queries: {recall:.4f}")

    # Sharded-path smoke on the REAL backend (VERDICT r3 weak #6: enforce,
    # don't just note).  A 1-device mesh exercises shard_map + the fused
    # Pallas kernel under check_vma=False on the real Mosaic backend —
    # which the virtual CPU mesh structurally cannot (parallel/
    # dist_query.py documents the hazard).  Non-fatal: a failure here
    # must not zero the headline, but it lands in the JSON every round.
    sharded_ok, sharded_recall = False, None
    try:
        from probly_search_tpu.parallel import ShardedDeviceIndex, make_mesh

        ix2 = Index(1, config=IndexConfig(result_format="slots"))
        ix2.add_documents_columnar(list(range(50_000)), [texts[:50_000]])
        sdix = ShardedDeviceIndex(ix2, make_mesh(data=1, docs=1))
        _ss, sh_slots, sh_keys = sdix.query_batch_async(
            queries[:512], scorer, top_k=top_k
        ).get_arrays()
        sh_hits = sh_total = 0
        for qi in range(32):
            oracle = ix2.query(
                queries[qi], bm25.new(), whitespace_tokenizer, [1.0]
            )[:top_k]
            o_keys = {r.key for r in oracle}
            d_keys = {
                int(k) for k, sl in zip(sh_keys[qi], sh_slots[qi]) if sl >= 0
            }
            sh_hits += len(o_keys & d_keys)
            sh_total += len(o_keys)
        sharded_recall = round(sh_hits / max(sh_total, 1), 4)
        sharded_ok = sharded_recall > 0.99
        log(f"sharded on-chip smoke: ok={sharded_ok} recall={sharded_recall}")
    except Exception as e:  # pragma: no cover - hardware-path guard
        log(f"sharded on-chip smoke FAILED: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "bm25_query_qps_1M_docs",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / 100_000.0, 4),
                "p50_window_ms": round(p50, 1),
                "p99_window_ms": round(p99, 1),
                "recall_at_10": round(recall, 4),
                "window_size": window,
                "result_format": "slots20",
                "qps_sections": [round(s, 1) for s in sections],
                "qps_model_ceiling": round(qps_model_ceiling, 1),
                "qps_sections_spread": round(spread, 3),
                "drained_bytes_per_query": drained_bytes_per_query,
                "plan_ms_mean": phase_ms("query/plan"),
                "prune_ms_mean": phase_ms("query/prune"),
                "pack_ms_mean": phase_ms("query/pack"),
                "drain_ms_mean": phase_ms("query/drain"),
                "fetch_ms_mean": phase_ms("query/fetch"),
                "sync_window_ms": round(sync_window_ms, 1),
                "device_ms_per_window": round(device_ms_per_window, 1),
                "warmup_s": round(warmup_s, 1),
                "sharded_onchip": sharded_ok,
                "sharded_recall": sharded_recall,
            }
        )
    )


if __name__ == "__main__":
    main()
