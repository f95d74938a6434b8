#!/usr/bin/env python
"""r7 session 4 (hardware): merge comparator-stage cost A/B.

The composed window is 100% device-busy in the class kernels (session 2)
and the merge ladder is ~70% of the fused kernel (r5 session 10), so the
remaining pace lever is ops-per-stage.  CE_VARIANT=2 in ops/pallas_merge
replaces the `is_high` predicate chain of every selected odd-even-merge
stage (8 vector ops) with a lane-shift of the low-lane swap mask (1 roll
+ 2 ops) — bit-exact by construction (is_high(i) == is_low(i-q) and the
pair's swap decision is symmetric).

Phases:
  K  fail-fast: tiny fused window per variant compiles + runs on chip.
  D  parity: slots bit-equal variant 1 vs 2 on both bench windows.
  P  interleaved pace A/B: queue-8 marginal on mixed windows, 3 reps per
     variant (pace is weather-invariant; switches clear _STEP_CACHE and
     re-trace, hitting the persistent compile cache).
  E  serving sections per variant (bench.py loop shape), 3 reps.

Run: one process, pipe to a file.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus, make_queries  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu import Index, IndexConfig, bm25
    from probly_search_tpu.index import device as dev
    from probly_search_tpu.ops import pallas_merge as pm

    window, top_k = 16384, 10
    t0 = time.time()
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index+snapshot {time.time() - t0:.0f}s")

    def set_variant(v):
        pm.CE_VARIANT = v
        dev._STEP_CACHE.clear()

    # --- phase K: fail-fast tiny windows ---------------------------------- #
    for v in (1, 2):
        set_variant(v)
        t1 = time.time()
        arrs = dix.query_batch_async(windows[0][:64], scorer, top_k=top_k).get_arrays()
        assert arrs[1] is not None and arrs[1].shape[0] == 64
        log(f"K v{v}: small fused window ok in {time.time() - t1:.1f}s")
    print(json.dumps({"phase": "K", "ok": True}), flush=True)

    # --- phase D: parity + per-variant warm ------------------------------- #
    packs = {}
    for v in (1, 2):
        set_variant(v)
        t1 = time.time()
        packs[v] = [
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
            for w in windows
        ]
        log(f"warm v{v} (incl. compiles): {time.time() - t1:.1f}s")
    eq = [
        bool(np.array_equal(packs[1][i][1], packs[2][i][1]))
        for i in range(len(windows))
    ]
    log(f"D: slots equal v1 vs v2: {eq}")
    print(json.dumps({"phase": "D", "slots_equal": eq}), flush=True)
    assert all(eq), "CE variant 2 diverged"

    # --- phase P: interleaved pace A/B ------------------------------------ #
    def queue_n(n):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        return 1e3 * (time.perf_counter() - t_s)

    def pace():
        t1 = min(queue_n(1) for _ in range(2))
        t8 = min(queue_n(8) for _ in range(2))
        return (t8 - t1) / 7.0

    paces = {1: [], 2: []}
    for rep in range(3):
        for v in (1, 2):
            set_variant(v)
            dix.query_batch_async(windows[0][:64], scorer, top_k=top_k).get_arrays()
            paces[v].append(pace())
            log(f"P rep{rep} v{v}: pace {paces[v][-1]:.1f} ms/window")
    print(
        json.dumps(
            {
                "phase": "P",
                "pace_v1_ms": [round(x, 1) for x in paces[1]],
                "pace_v2_ms": [round(x, 1) for x in paces[2]],
                "pace_v1_median": round(sorted(paces[1])[1], 1),
                "pace_v2_median": round(sorted(paces[2])[1], 1),
            }
        ),
        flush=True,
    )

    # --- phase E: serving sections per variant ----------------------------- #
    from concurrent.futures import ThreadPoolExecutor

    def timed_section(n_passes=4):
        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    pending.append(h)
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(
                            pool.submit(lambda pr: [x.get_arrays() for x in pr], pending)
                        )
                        pending = []
                    while len(futs) >= 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(lambda pr: [x.get_arrays() for x in pr], pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    qps = {1: [], 2: []}
    for rep in range(3):
        for v in (1, 2):
            set_variant(v)
            dix.query_batch_async(windows[0][:64], scorer, top_k=top_k).get_arrays()
            qps[v].append(timed_section())
            log(f"E rep{rep} v{v}: {qps[v][-1]:.0f} QPS")
    print(
        json.dumps(
            {
                "phase": "E",
                "qps_v1": [round(x) for x in qps[1]],
                "qps_v2": [round(x) for x in qps[2]],
                "qps_v1_median": round(sorted(qps[1])[1]),
                "qps_v2_median": round(sorted(qps[2])[1]),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
