"""r8 session 9: where does the ~6 ms/window serving slack come from?

BENCH_r8 runs measure ~301k QPS (54.3 ms/window effective) against a
queue-8 device-stream pace of 48.4 ms/window (ceiling 338.8k).  The gap
could be (a) tunnel-weather mismatch between the sections and the pace
probe (measured minutes apart), (b) host submit-path work leaking onto
the critical path (plan 7.6 + prune 5.4 + pack 4.2 + h2d 1.5 + dispatch
0.5 = 19.2 ms/window on this 1-CPU host), or (c) pipeline structure
(depth-4 paired late drains stalling submission).

One process, interleaved:
  A. alternate timed_section / queue-8 pace probe 3x — same-minute pace
     vs section-implied pace isolates weather from real slack.
  B. instrumented section — main-thread block time in futs.result() vs
     submit host time per window.
  C. prune_blocks on/off alternating sections (upper bound on what a
     prune-decision cache can recover).
  D. pipeline depth 4 vs 8 alternating sections.

Run on hardware: python benchmarks/r8s9_slack.py 2>&1 | tee /tmp/r8s9.log
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import threading

    t0 = time.time()

    def _init():
        import jax.numpy as _jnp

        np.asarray(jax.jit(lambda x: x + 1)(_jnp.zeros(8, _jnp.int32)))
        log(f"tpu init done t+{time.time() - t0:.1f}s")

    th = threading.Thread(target=_init, daemon=True)
    th.start()

    from bench import make_corpus, make_queries

    from probly_search_tpu import Index, IndexConfig, bm25
    from probly_search_tpu.utils.metrics import metrics

    n_docs = int(1e6)
    window = 16384
    top_k = 10
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    log(f"corpus gen t+{time.time() - t0:.1f}s")
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    log(f"build t+{time.time() - t0:.1f}s")
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    th.join()
    dix = ix.device_index()
    import os

    man = os.path.join("/root/repo", "benchmarks", "bench_templates.json")
    if os.path.exists(man):
        log(f"prewarm: {dix.load_templates(man)} tpl, {dix.prewarm(scorer)} prog")
    for _ in range(2):
        for w in windows:
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"warm t+{time.time() - t0:.1f}s")

    from concurrent.futures import ThreadPoolExecutor

    def timed_section(n_passes=6, depth=4, instrument=False):
        lat = []
        submit_ms = []
        block_ms = []
        drain_ms = []

        def drain_pair(pair):
            t_d = time.perf_counter()
            for t_submit, h in pair:
                h.get_arrays()
                lat.append(1e3 * (time.perf_counter() - t_submit))
            drain_ms.append(1e3 * (time.perf_counter() - t_d))

        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    t_s = time.perf_counter()
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    submit_ms.append(1e3 * (time.perf_counter() - t_s))
                    pending.append((time.perf_counter(), h))
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(pool.submit(drain_pair, pending))
                        pending = []
                    while len(futs) >= depth // 2:
                        t_b = time.perf_counter()
                        futs.pop(0).result()
                        block_ms.append(1e3 * (time.perf_counter() - t_b))
            if pending:
                futs.append(pool.submit(drain_pair, pending))
            for f in futs:
                f.result()
        dt = time.perf_counter() - t5
        qps = n_total / dt
        nw = n_passes * len(windows)
        if instrument:
            log(
                f"    submit/window {np.mean(submit_ms):.1f}ms "
                f"block/pair {np.mean(block_ms):.1f}ms "
                f"drain/pair {np.mean(drain_ms):.1f}ms "
                f"wall/window {1e3 * dt / nw:.1f}ms"
            )
        return qps, 1e3 * dt / nw

    def pace_probe():
        def queue_n(n):
            t_s = time.perf_counter()
            hs = [
                dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
                for i in range(n)
            ]
            np.asarray(hs[-1]._packed)
            return 1e3 * (time.perf_counter() - t_s)

        t1 = min(queue_n(1) for _ in range(2))
        t8 = min(queue_n(8) for _ in range(2))
        return (t8 - t1) / 7.0

    # ---- A: same-minute pace vs section pace -------------------------- #
    log("== A: interleaved section/pace ==")
    for rep in range(3):
        qps, eff = timed_section()
        pace = pace_probe()
        log(
            f"  rep{rep}: section {qps:.0f} QPS (eff {eff:.1f} ms/w) "
            f"vs pace {pace:.1f} ms/w -> slack {eff - pace:.1f} ms/w"
        )

    # ---- B: instrumented section -------------------------------------- #
    log("== B: instrumented sections ==")
    metrics.reset()
    for rep in range(2):
        qps, eff = timed_section(instrument=True)
        log(f"  rep{rep}: {qps:.0f} QPS")
    snap = metrics.snapshot()
    for name, h in sorted(snap["histograms"].items()):
        log(f"    phase {name:22s} n={h['count']:3d} mean={h['mean_us'] / 1e3:7.2f}ms")

    # ---- C: prune on/off ---------------------------------------------- #
    log("== C: prune on/off alternating ==")
    on, off = [], []
    for rep in range(6):
        ix.config.prune_blocks = rep % 2 == 0
        qps, eff = timed_section()
        (on if rep % 2 == 0 else off).append(qps)
        log(f"  rep{rep} prune={'on' if rep % 2 == 0 else 'off'}: {qps:.0f} QPS")
    ix.config.prune_blocks = True
    log(f"  median on {np.median(on):.0f} vs off {np.median(off):.0f}")

    # ---- D: depth 4 vs 8 ---------------------------------------------- #
    log("== D: depth 4 vs 8 alternating ==")
    d4, d8 = [], []
    for rep in range(6):
        depth = 4 if rep % 2 == 0 else 8
        qps, eff = timed_section(depth=depth)
        (d4 if depth == 4 else d8).append(qps)
        log(f"  rep{rep} depth={depth}: {qps:.0f} QPS")
    log(f"  median d4 {np.median(d4):.0f} vs d8 {np.median(d8):.0f}")
    log(f"done t+{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
