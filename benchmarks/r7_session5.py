#!/usr/bin/env python
"""r7 session 5 (hardware): fused in-kernel merge vs staged lax.sort merge.

The CE-variant A/B (session 4) showed the comparator network's predicate
chains are free (Mosaic constant-folds iota-derived masks) — the ladder's
cost is pure value movement, so in-kernel micro-opts are exhausted.  The
remaining unknown: XLA's native `lax.sort` machinery (used by the staged
"lanes" path for wide classes, where it measured -37% vs its predecessor)
was never A/B'd against the fused merge for the DOMINANT classes.

Knob: index.device._FUSED_MAX_LANES — classes with L above it take the
lanes path (Pallas gather+score kernel writing [B, L] scored lanes, then
ops/merge.merge_scores_topk_presorted: lax.sort + segmented scans +
lax.top_k in staged XLA).  Thresholds swept: 16384 (ship: everything
fused), 8192, 4096, 0 (everything staged).

Phases:
  D  parity: slots bit-equal across all thresholds on both bench windows.
  P  interleaved pace per threshold (queue-8 marginal, 3 reps, medians).
  E  serving sections for ship vs the best challenger threshold.

Run: one process, pipe to a file.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus, make_queries  # noqa: E402

THRESHOLDS = (16384, 8192, 4096, 0)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu import Index, IndexConfig, bm25
    from probly_search_tpu.index import device as dev

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

    def set_threshold(t):
        dev._FUSED_MAX_LANES = t
        dev._STEP_CACHE.clear()

    # --- phase D: warm every threshold + parity --------------------------- #
    packs = {}
    for t in THRESHOLDS:
        set_threshold(t)
        t1 = time.time()
        packs[t] = [
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
            for w in windows
        ]
        log(f"warm threshold={t} (incl. compiles): {time.time() - t1:.1f}s")
    ship = THRESHOLDS[0]
    eq = {
        t: [
            bool(np.array_equal(packs[ship][i][1], packs[t][i][1]))
            for i in range(len(windows))
        ]
        for t in THRESHOLDS[1:]
    }
    log(f"D: slots equal vs ship: {eq}")
    print(json.dumps({"phase": "D", "slots_equal": {str(k): v for k, v in eq.items()}}), flush=True)
    assert all(all(v) for v in eq.values()), "staged path diverged"

    # --- phase P: interleaved pace per threshold --------------------------- #
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

    paces = {t: [] for t in THRESHOLDS}
    for rep in range(3):
        for t in THRESHOLDS:
            set_threshold(t)
            dix.query_batch_async(windows[0][:64], scorer, top_k=top_k).get_arrays()
            paces[t].append(pace())
            log(f"P rep{rep} threshold={t}: pace {paces[t][-1]:.1f} ms/window")
    med = {t: round(sorted(v)[1], 1) for t, v in paces.items()}
    print(
        json.dumps(
            {
                "phase": "P",
                "pace_ms": {str(t): [round(x, 1) for x in v] for t, v in paces.items()},
                "pace_median_ms": {str(t): m for t, m in med.items()},
            }
        ),
        flush=True,
    )

    # --- phase E: serving sections, ship vs best challenger ---------------- #
    challenger = min((t for t in THRESHOLDS[1:]), key=lambda t: med[t])
    if med[challenger] >= med[ship]:
        log(f"E: no challenger beats ship pace ({med}); serving A/B skipped")
        paces = {str(t): m for t, m in med.items()}
        print(json.dumps({"phase": "E", "skipped": True, "pace_median_ms": paces}), flush=True)
        return

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

    qps = {ship: [], challenger: []}
    for rep in range(3):
        for t in (ship, challenger):
            set_threshold(t)
            dix.query_batch_async(windows[0][:64], scorer, top_k=top_k).get_arrays()
            qps[t].append(timed_section())
            log(f"E rep{rep} threshold={t}: {qps[t][-1]:.0f} QPS")
    print(
        json.dumps(
            {
                "phase": "E",
                "qps": {str(t): [round(x) for x in v] for t, v in qps.items()},
                "qps_median": {str(t): round(sorted(v)[1]) for t, v in qps.items()},
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
