#!/usr/bin/env python
"""Round-2 TPU experiments (one process; interleaved A/B per CLAUDE.md):

1. z2o 50k bench batch-size A/B (512 / 2048 / 4096) — the 512-query batch
   pays ~60 ms of fixed round-trip cost per batch; larger windows amortize.
2. Expansion-heavy BM25 queries on the 1M-doc bench corpus via term-range
   jobs: warm latency of a single-prefix query (target < 100 ms) + parity
   vs the vectorized host path.
3. Sanity: one BM25 16384-window timing (hot-path regression check after
   the per-lane scale change).

Diagnostics to stderr; per-experiment JSON lines to stdout.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(x)  # device->host read (block_until_ready lies on this runtime)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25, zero_to_one, whitespace_tokenizer

    import os

    rng = np.random.default_rng(7)

    # ---------------- experiment 1: z2o batch size ----------------------- #
    if os.environ.get("SKIP_Z2O"):
        run_z2o = False
    else:
        run_z2o = True
    if run_z2o:
        _z2o_experiment(rng)

    # ---------------- experiment 2: term-range queries at 1M ------------- #
    _heavy_experiment()


def _z2o_experiment(rng):
    import time

    from probly_search_tpu import Index, zero_to_one

    vocab = np.array(["w%04d" % i for i in range(4000)])
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.05
    cdf = np.cumsum(weights)
    cdf /= cdf[-1]

    def texts(n, length):
        ids = np.searchsorted(cdf, rng.random((n, length)))
        return [" ".join(row) for row in vocab[np.minimum(ids, len(vocab) - 1)]]

    ix = Index(2)
    ix.add_documents_columnar(list(range(50_000)), [texts(50_000, 3), texts(50_000, 8)])
    lo = cdf[49]
    qids = np.searchsorted(cdf, lo + rng.random((4096, 2)) * (1.0 - lo))
    qpool = [" ".join(row) for row in vocab[np.minimum(qids, len(vocab) - 1)]]
    scorer = zero_to_one.new()

    sizes = [512, 2048, 4096]
    for bs in sizes:  # warm every shape
        t0 = time.time()
        ix.query_batch(qpool[:bs], scorer, top_k=10, backend="device")
        log(f"z2o warm bs={bs}: {time.time() - t0:.1f}s")
    results = {bs: [] for bs in sizes}
    for rep in range(3):
        for bs in sizes:
            t0 = time.perf_counter()
            ix.query_batch(qpool[:bs], scorer, top_k=10, backend="device")
            dt = time.perf_counter() - t0
            results[bs].append(bs / dt)
    for bs in sizes:
        med = sorted(results[bs])[1]
        log(f"z2o bs={bs}: reps {[f'{q:.0f}' for q in results[bs]]} median {med:.0f} QPS")
        print(json.dumps({"metric": f"z2o_qps_bs{bs}", "value": round(med, 1),
                          "unit": "queries/s", "vs_baseline": None}))


def _heavy_experiment():
    import time

    from probly_search_tpu import Index, bm25, whitespace_tokenizer

    from bench import make_corpus, make_queries

    t0 = time.time()
    vocab1, cdf1, texts1 = make_corpus(int(1e6), 50_000, 8)
    ix1 = Index(1)
    ix1.add_documents_columnar(list(range(int(1e6))), [texts1])
    log(f"1M corpus+index: {time.time() - t0:.1f}s")
    dix = ix1.device_index()
    heavy = ["t", "t0", "t1", "t4"]
    plan, fb = dix.plan_batch(heavy, whitespace_tokenizer, bm25.new())
    log(f"heavy plan: fallback={fb} njobs={None if plan is None else plan.njobs.tolist()} "
        f"nchunks={None if plan is None else plan.nchunks.tolist()} "
        f"has_range={None if plan is None else plan.has_range.tolist()}")
    for q in heavy:  # warm (compile per class)
        t0 = time.time()
        h = dix.query_batch_async([q], bm25.new(), top_k=10)
        sync(h.get_arrays()[0])
        log(f"warm heavy {q!r}: {time.time() - t0:.1f}s")
    lat = {}
    for rep in range(3):
        for q in heavy:
            t0 = time.perf_counter()
            h = dix.query_batch_async([q], bm25.new(), top_k=10)
            scores, slots, keys = h.get_arrays()
            lat.setdefault(q, []).append(1e3 * (time.perf_counter() - t0))
    for q in heavy:
        med = sorted(lat[q])[1]
        log(f"heavy {q!r}: {[f'{m:.0f}' for m in lat[q]]} ms, median {med:.0f} ms")
        print(json.dumps({"metric": f"heavy_query_ms_{q}", "value": round(med, 1),
                          "unit": "ms", "vs_baseline": None}))
    # parity vs the vectorized host path (the f64 exact path would walk
    # millions of postings in python)
    for q in heavy:
        rows = dix.query_batch([q], bm25.new(), top_k=10)[0]
        want = bm25.new().vectorized_query(ix1, q, whitespace_tokenizer, top_k=10)
        assert len(rows) == len(want), q
        wd = {r.key: r.score for r in bm25.new().vectorized_query(ix1, q, whitespace_tokenizer)}
        for a, b in zip(rows, want):
            assert abs(a.score - b.score) < 5e-5 * max(1.0, abs(b.score)), (q, a, b)
        for a in rows:
            assert abs(a.score - wd[a.key]) < 5e-5 * max(1.0, abs(wd[a.key])), (q, a)
    log("heavy-query parity vs vectorized host: OK")

    # ---------------- experiment 3: BM25 hot-path sanity ----------------- #
    queries = make_queries(vocab1, cdf1, 16384, 3)
    dix.query_batch(queries, bm25.new(), top_k=10)  # warm
    reps = []
    for rep in range(3):
        t0 = time.perf_counter()
        h = dix.query_batch_async(queries, bm25.new(), top_k=10)
        h.get_arrays()
        reps.append(16384 / (time.perf_counter() - t0))
    log(f"bm25 single-window (no pipeline): {[f'{q:.0f}' for q in reps]} QPS")
    print(json.dumps({"metric": "bm25_single_window_qps", "value": round(sorted(reps)[1], 1),
                      "unit": "queries/s", "vs_baseline": None}))


if __name__ == "__main__":
    main()
