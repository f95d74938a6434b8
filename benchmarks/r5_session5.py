#!/usr/bin/env python
"""Round-3 TPU session 5: z2o plan cache + slots drain at 8192-query windows.

Session 4 found the 8192-query z2o window bound by plan (66 ms, no z2o
query-plan cache) and drain (80 ms at the f32 format's 80 B/query).  Both
fixes landed (pooled per-query plans; compact/slots packed formats).
Expected: plan ~5 ms, slots drain ~50 ms, window at device compute
(~85 ms) -> ~95k QPS.  Interleaved A/B fmt=f32 vs fmt=slots, one process.
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
    B = 8192

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
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((B, 2)) * (1.0 - lo))
    queries = [" ".join(row) for row in zv[np.minimum(qids, len(zv) - 1)]]
    zdix = zix.device_index()
    log(f"z2o corpus built ({time.time() - t0:.0f}s)")

    fmts = []
    for fmt in ("f32", "slots"):
        tw = time.time()
        try:
            for s in range(0, B, 2048):
                z2o_query_batch_async(
                    zdix, queries[s : s + 2048], whitespace_tokenizer, 10, fmt=fmt
                ).get_arrays()
            z2o_query_batch_async(
                zdix, queries, whitespace_tokenizer, 10, fmt=fmt
            ).get_arrays()
            log(f"warm[{fmt}] ({time.time() - tw:.0f}s)")
            out[f"warm_s_{fmt}"] = round(time.time() - tw, 1)
            fmts.append(fmt)
        except Exception as e:
            log(f"warm[{fmt}] FAILED: {e!r:.600s}")
            out[f"warm_error_{fmt}"] = repr(e)[:300]

    def section(fmt, passes=3):
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _ in range(passes):
                h = z2o_query_batch_async(
                    zdix, queries, whitespace_tokenizer, 10, fmt=fmt
                )
                futs.append(pool.submit(h.get_arrays))
                if len(futs) >= depth:
                    futs.pop(0).result()
            for f in futs:
                f.result()
        return passes * B / (time.perf_counter() - t1)

    res = {f: [] for f in fmts}
    phases = {f: {} for f in fmts}
    for rep in range(5):
        for fmt in fmts:
            metrics.reset()
            q = section(fmt)
            res[fmt].append(q)
            snap = metrics.snapshot()["histograms"]
            for name in ("z2o/plan", "z2o/pack", "z2o/dispatch", "query/drain"):
                h = snap.get(name)
                if h:
                    phases[fmt].setdefault(name, []).append(h["mean_us"] / 1e3)
            log(f"rep {rep} fmt={fmt}: {q:.0f} QPS")
    for fmt in fmts:
        med = sorted(res[fmt])[len(res[fmt]) // 2]
        log(f"fmt={fmt}: {[f'{q:.0f}' for q in res[fmt]]} median {med:.0f}")
        out[f"z2o_qps_{fmt}"] = round(med, 1)
        out[f"z2o_qps_{fmt}_reps"] = [round(q) for q in res[fmt]]
        for name, vals in phases[fmt].items():
            key = f"{name.split('/')[-1]}_ms_{fmt}"
            out[key] = round(sorted(vals)[len(vals) // 2], 2)
            log(f"  fmt={fmt} {name}: median {out[key]:.2f} ms/window")

    # Parity: f32 scores vs the f64 oracle; slots ranking == f32 ranking.
    sample = queries[:24]
    s32, sl32, k32 = z2o_query_batch_async(
        zdix, sample, whitespace_tokenizer, 10, fmt="f32"
    ).get_arrays()
    if "slots" in fmts:
        _, sls, ks = z2o_query_batch_async(
            zdix, sample, whitespace_tokenizer, 10, fmt="slots"
        ).get_arrays()
        assert (sls == sl32).all()
        out["slots_ranking_identical"] = True
    worst = 0.0
    for qi, q in enumerate(sample):
        oracle = zix.query(
            q, zero_to_one.new(), whitespace_tokenizer, [1.0, 1.0], top_k=10
        )
        ok = [r.key for r in oracle]
        dk = [int(x) for x, sl in zip(k32[qi], sl32[qi]) if sl >= 0]
        assert dk == ok, (q, dk, ok)
        a = [float(s) for s, sl in zip(s32[qi], sl32[qi]) if sl >= 0]
        b = [r.score for r in oracle]
        worst = max(
            worst,
            max((abs(x - y) / max(1e-9, abs(y)) for x, y in zip(a, b)), default=0.0),
        )
    log(f"parity: worst rel err {worst:.2e}, rankings oracle-equal")
    assert worst < 1e-4, worst
    out["z2o_worst_rel_err"] = worst

    print(json.dumps(out))


if __name__ == "__main__":
    main()
