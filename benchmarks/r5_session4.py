#!/usr/bin/env python
"""Round-3 TPU session 4: z2o batch-size scaling + phase breakdown.

Session 3 landed the fused z2o kernel at 42.6k QPS with 2048-query batches
(vs the 80k target).  PERFORMANCE.md's diagnosis: a 2048-query batch pays
the ~60 ms fixed sync+fetch round trip 8x more often than BM25's
16384-query windows.  This session answers two questions in one process:

1. Phase breakdown per batch size (z2o/plan, z2o/pack, z2o/dispatch,
   query/drain, plus a no-pipeline sync window time) — where does the
   window actually go at each B?
2. Does B in {2048, 4096, 8192} amortize the fixed cost (interleaved A/B,
   5 reps, medians)?  Larger B only grows the per-class B_pad (new shape
   classes compile once into the persistent cache); the window program is
   still one jit + one packed fetch.

2048 warms FIRST so a wedged 8192 compile still leaves comparable numbers.
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

    from probly_search_tpu import Index, whitespace_tokenizer, zero_to_one
    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async
    from probly_search_tpu.utils.metrics import metrics

    out = {}
    depth = 3
    B_SIZES = [2048, 4096, 8192]

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
    n_max = max(B_SIZES)
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((n_max, 2)) * (1.0 - lo))
    all_queries = [" ".join(row) for row in zv[np.minimum(qids, len(zv) - 1)]]
    zdix = zix.device_index()
    log(f"z2o corpus built ({time.time() - t0:.0f}s)")

    ok_sizes = []
    for B in B_SIZES:
        tw = time.time()
        try:
            for s in range(0, B, 2048):
                z2o_query_batch_async(
                    zdix, all_queries[s : s + 2048], whitespace_tokenizer, 10
                ).get_arrays()
                log(f"warm[{B}] slice {s + 2048} ({time.time() - tw:.0f}s)")
            z2o_query_batch_async(
                zdix, all_queries[:B], whitespace_tokenizer, 10
            ).get_arrays()
            log(f"warm[{B}] full ({time.time() - tw:.0f}s)")
            out[f"warm_s_{B}"] = round(time.time() - tw, 1)
            ok_sizes.append(B)
        except Exception as e:
            log(f"warm[{B}] FAILED: {e!r:.600s}")
            out[f"warm_error_{B}"] = repr(e)[:300]
            break  # bigger sizes would hit the same compile wall

    def section(B, n_q=24576):
        queries = all_queries[:B]
        passes = max(2, n_q // B)
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _ in range(passes):
                h = z2o_query_batch_async(zdix, queries, whitespace_tokenizer, 10)
                futs.append(pool.submit(h.get_arrays))
                if len(futs) >= depth:
                    futs.pop(0).result()
            for f in futs:
                f.result()
        return passes * B / (time.perf_counter() - t1)

    # Sync (no-pipeline) window time per B: fixed-cost amortization direct.
    for B in ok_sizes:
        ts = []
        for _ in range(3):
            t1 = time.perf_counter()
            z2o_query_batch_async(
                zdix, all_queries[:B], whitespace_tokenizer, 10
            ).get_arrays()
            ts.append(1e3 * (time.perf_counter() - t1))
        med = sorted(ts)[1]
        log(f"sync window B={B}: {med:.1f}ms {[f'{t:.0f}' for t in ts]}")
        out[f"sync_window_ms_{B}"] = round(med, 1)

    # Interleaved QPS A/B + per-B phase means.
    res = {B: [] for B in ok_sizes}
    phases = {B: {} for B in ok_sizes}
    for rep in range(5):
        for B in ok_sizes:
            metrics.reset()
            q = section(B)
            res[B].append(q)
            snap = metrics.snapshot()["histograms"]
            for name in ("z2o/plan", "z2o/pack", "z2o/dispatch", "query/drain"):
                h = snap.get(name)
                if h:
                    phases[B].setdefault(name, []).append(h["mean_us"] / 1e3)
            log(f"rep {rep} B={B}: {q:.0f} QPS")
    for B in ok_sizes:
        med = sorted(res[B])[len(res[B]) // 2]
        log(f"B={B}: {[f'{q:.0f}' for q in res[B]]} median {med:.0f}")
        out[f"z2o_qps_{B}"] = round(med, 1)
        out[f"z2o_qps_{B}_reps"] = [round(q) for q in res[B]]
        for name, vals in phases[B].items():
            key = f"{name.split('/')[-1]}_ms_{B}"
            out[key] = round(sorted(vals)[len(vals) // 2], 2)
            log(f"  B={B} {name}: median {out[key]:.2f} ms/window")

    best = max(ok_sizes, key=lambda B: sorted(res[B])[len(res[B]) // 2])
    out["z2o_best_B"] = best
    out["z2o_qps"] = out[f"z2o_qps_{best}"]

    # Parity vs the f64 oracle at the best B (fused auto mode is default).
    sample = all_queries[:24]
    rows = zix.query_batch(sample, zero_to_one.new(), top_k=10, backend="device")
    worst = 0.0
    for q, row in zip(sample, rows):
        oracle = zix.query(
            q, zero_to_one.new(), whitespace_tokenizer, [1.0, 1.0], top_k=10
        )
        assert len(row) == len(oracle), q
        assert [r.key for r in row] == [r.key for r in oracle], q
        a = [r.score for r in row]
        b = [r.score for r in oracle]
        worst = max(
            worst,
            max((abs(x - y) / max(1e-9, abs(y)) for x, y in zip(a, b)), default=0.0),
        )
    log(f"parity: worst rel err {worst:.2e}, rankings equal")
    assert worst < 1e-4, worst
    out["z2o_worst_rel_err"] = worst

    print(json.dumps(out))


if __name__ == "__main__":
    main()
