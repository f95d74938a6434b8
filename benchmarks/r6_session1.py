#!/usr/bin/env python
"""Round-3 TPU session 12 (r6_session1): fine NC buckets + dead-chunk DMA skip.

Two device-compute levers on the 1M-doc BM25 bench:
  * fine_nc_buckets: non-pow2 fused classes (NC 2/3/6/12/24) via the
    phantom-tail virtual-pow2 merge network — the dominant 3-chunk query
    class stops padding to NC=4.
  * dead padding chunks skip their DMA entirely (pl.when scalar guard).

Protocol (CLAUDE.md): one process, interleaved reps, medians; parity
asserted between modes before timing; queue-8 device pace per mode.
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

    import bench as benchmod
    from probly_search_tpu import Index, IndexConfig, bm25, whitespace_tokenizer
    from probly_search_tpu.index.device import DeviceIndex

    n_docs = int(1e6)
    window = 16384
    t0 = time.time()
    vocab, cdf, texts = benchmod.make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = benchmod.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"corpus+index+snapshot: {time.time()-t0:.0f}s")

    MODES = {
        "fine": (DeviceIndex.NC_BUCKETS_FINE, 2),
        "coarse": (DeviceIndex.NC_BUCKETS, 4),
    }

    def set_mode(m):
        dix.nc_buckets, dix.nc_min = MODES[m]

    out = {}

    # --- class composition per mode (host only) ---------------------------
    for m in MODES:
        set_mode(m)
        plan, fb = dix.plan_batch(windows[0], whitespace_tokenizer, scorer)
        packs = dix.pack_dispatches(len(windows[0]), plan)
        comp = {}
        for idxs, _j, nc, _nj, _r in packs:
            comp[nc] = comp.get(nc, 0) + len(idxs)
        lanes = sum(nc * 1024 * len(idxs) for idxs, _j, nc, _nj, _r in packs)
        out[f"classes_{m}"] = {str(k): v for k, v in sorted(comp.items())}
        out[f"Mlanes_{m}"] = round(lanes / 1e6, 2)
        log(f"{m}: classes {sorted(comp.items())} lanes {lanes/1e6:.1f}M")

    # --- parity between modes (and compile warmup) ------------------------
    got = {}
    for m in MODES:
        set_mode(m)
        t = time.time()
        for w in windows:
            got.setdefault(m, []).append(
                dix.query_batch_async(w, scorer, top_k=10).get_arrays()
            )
        log(f"{m}: warm+compile {time.time()-t:.0f}s")
    for (a_s, a_sl, a_k), (b_s, b_sl, b_k) in zip(got["fine"], got["coarse"]):
        assert np.array_equal(a_sl, b_sl), "slot mismatch between modes"
        assert np.array_equal(a_k, b_k), "key mismatch between modes"
    out["parity"] = "bit-equal"
    log("parity: fine == coarse (bit-equal slots/keys)")

    # --- interleaved serving A/B ------------------------------------------
    from concurrent.futures import ThreadPoolExecutor

    def timed_section(n_passes=4):
        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=10)
                    futs.append(pool.submit(lambda hh=h: hh.get_arrays()))
                    n_total += len(w)
                    if len(futs) >= 3:
                        futs.pop(0).result()
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    qps = {m: [] for m in MODES}
    for m in MODES:  # settle queues once per mode before timing
        set_mode(m)
        timed_section(1)
    for rep in range(5):
        for m in MODES:
            set_mode(m)
            q = timed_section()
            qps[m].append(q)
            log(f"rep {rep} {m}: {q:.0f} QPS")
    for m in MODES:
        out[f"qps_{m}"] = [round(x) for x in qps[m]]
        out[f"qps_{m}_median"] = round(float(np.median(qps[m])))

    # --- queue-8 device pace (weather-invariant) ---------------------------
    def queue_n(n):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=10)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        return 1e3 * (time.perf_counter() - t_s)

    pace = {m: [] for m in MODES}
    for rep in range(3):
        for m in MODES:
            set_mode(m)
            t1w = min(queue_n(1) for _ in range(2))
            t8w = min(queue_n(8) for _ in range(2))
            pace[m].append((t8w - t1w) / 7.0)
    for m in MODES:
        out[f"device_ms_{m}"] = [round(x, 1) for x in pace[m]]
        out[f"device_ms_{m}_median"] = round(float(np.median(pace[m])), 1)
        log(f"{m}: device {out[f'device_ms_{m}_median']} ms/window {pace[m]}")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
