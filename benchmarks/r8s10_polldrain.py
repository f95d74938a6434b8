"""r8 session 10: does the BLOCKING drain fetch steal device pace?

r8s9 established the ~6 ms/window serving slack is real (same-minute
pace probes).  Hypothesis: the drain worker's blocking d2h read holds the
tunnel connection for the whole device-wait, delaying the main thread's
h2d/dispatch traffic behind it — a few ms of device idle per window.

Test: a poll-drain worker (sleep-poll ``h._packed.is_ready()`` and only
call get_arrays on landed buffers) vs the blocking baseline, interleaved
A/B in one process, depth 8 both.  Also a same-minute submission-only
pace (queue-12, drain at end) as the ceiling reference.

Run: python benchmarks/r8s10_polldrain.py 2>&1 | tee /tmp/r8s10.log
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

    n_docs = int(1e6)
    window = 16384
    top_k = 10
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    th.join()
    dix = ix.device_index()
    import os

    man = os.path.join("/root/repo", "benchmarks", "bench_templates.json")
    if os.path.exists(man):
        dix.load_templates(man)
        dix.prewarm(scorer)
    for _ in range(2):
        for w in windows:
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log(f"warm t+{time.time() - t0:.1f}s")

    # is_ready sanity: cost + truthiness on a landed and an in-flight buffer.
    h = dix.query_batch_async(windows[0], scorer, top_k=top_k)
    t_ir = time.perf_counter()
    r0 = h._packed.is_ready()
    dt_ir = 1e3 * (time.perf_counter() - t_ir)
    h.get_arrays()
    t_ir2 = time.perf_counter()
    r1 = h._packed.is_ready()
    dt_ir2 = 1e3 * (time.perf_counter() - t_ir2)
    log(f"is_ready: inflight={r0} ({dt_ir:.2f}ms) landed={r1} ({dt_ir2:.2f}ms)")

    from concurrent.futures import ThreadPoolExecutor

    def timed_section(poll, n_passes=6, depth=8):
        def drain_pair(pair):
            for t_submit, h in pair:
                if poll:
                    while not h._packed.is_ready():
                        time.sleep(0.004)
                h.get_arrays()

        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    h = dix.query_batch_async(w, scorer, top_k=top_k)
                    pending.append((time.perf_counter(), h))
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(pool.submit(drain_pair, pending))
                        pending = []
                    while len(futs) >= depth // 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(drain_pair, pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    def submit_only_pace(n=12):
        t_s = time.perf_counter()
        hs = [
            dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
            for i in range(n)
        ]
        np.asarray(hs[-1]._packed)
        dt = 1e3 * (time.perf_counter() - t_s)
        for h in hs:
            h.get_arrays()
        return dt / n

    log("== interleaved: blocking vs poll drain (depth 8) ==")
    blocking, polling = [], []
    for rep in range(8):
        poll = rep % 2 == 1
        qps = timed_section(poll)
        (polling if poll else blocking).append(qps)
        pace = submit_only_pace()
        log(
            f"  rep{rep} {'poll ' if poll else 'block'}: {qps:.0f} QPS "
            f"(pace ref {pace:.1f} ms/w -> ceiling {1e3 * window / pace:.0f})"
        )
    log(
        f"  median block {np.median(blocking):.0f} vs poll {np.median(polling):.0f}"
    )
    log(f"done t+{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
