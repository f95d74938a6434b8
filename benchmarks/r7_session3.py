#!/usr/bin/env python
"""r7 session 3 (hardware): template compositions + dead-block skip A/B.

What changed since session 2:
* IndexConfig.template_compositions — the window's class composition is
  frozen into a reusable template (ONE window program per stream; spills
  instead of new compositions; VERDICT r3 item 4).
* Dead-block skip in the fused kernel (ops/pallas_query.py): whole pad-row
  blocks emit sentinels and skip gather+merge, so template headroom rows
  cost ~nothing on device.
* Template packing merges each class's pow2 row-split spans into ONE
  exact-height dispatch: bench window goes ~16 -> ~7-9 dispatches (the
  per-dispatch fixed device cost measured ~1 ms, session 1c).

Phases:
  K  fail-fast kernel smoke: tiny fused shape compiles + runs on the real
     Mosaic backend (the dead-block-skip pl.when wrapper is new lowering).
  A  composed warm (2 bench windows; kernels changed -> recompiles).
  B  template warm: window0 (freeze + ONE composition compile), window1,
     then 4 FRESH query mixes — per-window wall time + refreeze count.
     Item-4 headline: fresh mixes should pay plan+pack only (~ms).
  C  composed fresh mix: ONE new composition (the 30-120 s baseline).
  D  parity: template vs composed slots bit-equal on both bench windows.
  E  interleaved serving A/B (bench.py loop shape): 3 sections per mode +
     queue-8 device pace per mode.

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
    from probly_search_tpu.utils.metrics import metrics

    window, top_k = 16384, 10
    t0 = time.time()
    vocab, cdf, texts = make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = make_queries(vocab, cdf, window * 8, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index+snapshot {time.time() - t0:.0f}s")

    # --- phase K: fail-fast kernel smoke --------------------------------- #
    t1 = time.time()
    small = dix.query_batch_async(windows[0][:64], scorer, top_k=top_k)
    arrs = small.get_arrays()
    assert arrs[1] is not None and arrs[1].shape[0] == 64
    log(f"K: small fused window ok in {time.time() - t1:.1f}s")
    print(json.dumps({"phase": "K", "ok": True, "s": round(time.time() - t1, 1)}), flush=True)

    def timed_window(i, mode):
        t1 = time.time()
        dix.query_batch_async(windows[i], scorer, top_k=top_k).get_arrays()
        dt = time.time() - t1
        log(f"{mode} window {i}: {dt:.1f}s")
        return round(dt, 1)

    # --- phase A: composed warm ------------------------------------------ #
    a_times = [timed_window(i, "A composed") for i in (0, 1)]
    a_times += [timed_window(i, "A composed(re)") for i in (0, 1)]
    print(json.dumps({"phase": "A", "warm_s": a_times}), flush=True)

    # --- phase B: template warm + fresh mixes ----------------------------- #
    dix.config.template_compositions = True
    rf0 = metrics.counters["template_refreezes"]
    b_times = [timed_window(i, "B template") for i in (0, 1, 0, 1)]
    fresh_times = [timed_window(i, "B fresh-mix") for i in (2, 3, 4, 5)]
    refreezes = metrics.counters["template_refreezes"] - rf0
    log(f"B: refreezes {refreezes}")
    print(
        json.dumps(
            {
                "phase": "B",
                "warm_s": b_times,
                "fresh_mix_s": fresh_times,
                "refreezes": refreezes,
                "template_entries": [
                    [list(map(int, e)) for e in v]
                    for v in dix._comp_templates.values()
                ],
            }
        ),
        flush=True,
    )

    # --- phase C: composed fresh mix (baseline compile cost) -------------- #
    dix.config.template_compositions = False
    c_time = timed_window(6, "C composed fresh")
    print(json.dumps({"phase": "C", "fresh_composition_s": c_time}), flush=True)

    # --- phase D: parity --------------------------------------------------- #
    eq = []
    for i in (0, 1):
        base = dix.query_batch_async(windows[i], scorer, top_k=top_k).get_arrays()
        dix.config.template_compositions = True
        tpl = dix.query_batch_async(windows[i], scorer, top_k=top_k).get_arrays()
        dix.config.template_compositions = False
        eq.append(bool(np.array_equal(base[1], tpl[1])))
    log(f"D: slots equal composed vs template: {eq}")
    print(json.dumps({"phase": "D", "slots_equal": eq}), flush=True)
    assert all(eq), "template path diverged from composed"

    # --- phase E: interleaved serving A/B ---------------------------------- #
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

    def timed_section(n_passes=4):
        from concurrent.futures import ThreadPoolExecutor

        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows[:2]:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    pending.append(h)
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(
                            pool.submit(
                                lambda pr: [x.get_arrays() for x in pr], pending
                            )
                        )
                        pending = []
                    while len(futs) >= 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(lambda pr: [x.get_arrays() for x in pr], pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    qps = {"composed": [], "template": []}
    pcs = {"composed": [], "template": []}
    for rep in range(3):
        for mode in ("composed", "template"):
            dix.config.template_compositions = mode == "template"
            qps[mode].append(timed_section())
            pcs[mode].append(pace())
            log(
                f"E rep{rep} {mode}: {qps[mode][-1]:.0f} QPS, "
                f"pace {pcs[mode][-1]:.1f} ms/window"
            )
    out = {
        m: {
            "qps_median": round(sorted(qps[m])[1]),
            "qps_reps": [round(x) for x in qps[m]],
            "pace_median_ms": round(sorted(pcs[m])[1], 1),
            "pace_reps_ms": [round(x, 1) for x in pcs[m]],
        }
        for m in qps
    }
    print(json.dumps({"phase": "E", **out}), flush=True)


if __name__ == "__main__":
    main()
