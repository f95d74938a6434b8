#!/usr/bin/env python
"""Per-phase profile of the batched query path on real hardware.

Answers the round-1 open question: where do the ~350 ms per 2048-query
window go?  Runs the headline workload at several window sizes in both
dispatch modes (per-class vs single-window) and prints the phase
histograms (plan / pack / h2d / dispatch / drain), plus raw transfer
probes.  Diagnostics only — run bench.py for the number of record.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402


def sync(x):
    return np.asarray(x)


def probe_transfers():
    import jax
    import jax.numpy as jnp

    log("--- transfer probes ---")
    f = jax.jit(lambda x: x + 1)
    for kb in (4, 64, 400, 1024):
        a = np.zeros(kb * 256, np.int32)  # kb KB
        sync(f(jnp.asarray(a)))  # warm compile for this shape
        t0 = time.perf_counter()
        d = jnp.asarray(a)
        t1 = time.perf_counter()
        r = f(d)
        t2 = time.perf_counter()
        sync(r)
        t3 = time.perf_counter()
        log(
            f"size {kb:5d}KB: h2d {1e3 * (t1 - t0):7.1f}ms dispatch "
            f"{1e3 * (t2 - t1):7.1f}ms d2h+wait {1e3 * (t3 - t2):7.1f}ms"
        )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25
    from probly_search_tpu.utils.metrics import metrics

    probe_transfers()

    n_docs = int(1e6)
    t0 = time.time()
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = make_queries(vocab, cdf, 16384, 3)
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"setup: {time.time() - t0:.1f}s")

    for mode in (False, True):
        dix.config.single_dispatch_windows = mode
        for W in (2048, 8192, 16384):
            qs = queries[:W]
            dix.query_batch(qs, scorer, top_k=10)  # warm compile
            metrics.reset()
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                rows = dix.query_batch(qs, scorer, top_k=10)
                times.append(time.perf_counter() - t0)
            assert len(rows) == W
            qps = W / (sum(times) / len(times))
            snap = metrics.snapshot()
            log(
                f"mode={'window' if mode else 'per-class'} W={W}: "
                f"{1e3 * min(times):.0f}/{1e3 * (sum(times) / 3):.0f} ms "
                f"(min/avg) -> {qps:.0f} QPS"
            )
            for name, h in sorted(snap["histograms"].items()):
                log(
                    f"    {name:22s} n={h['count']:3d} mean={h['mean_us'] / 1e3:8.2f}ms "
                    f"total={h['count'] * h['mean_us'] / 1e3:8.1f}ms"
                )
            log(f"    dispatches={snap['counters'].get('dispatches')}")

    # --- pipelined submission: overlap host planning with device work ---- #
    dix.config.single_dispatch_windows = True
    total = len(queries)
    for W in (2048, 4096, 8192):
        wins = [queries[i : i + W] for i in range(0, total, W)]
        for w in wins:
            dix.query_batch(w, scorer, top_k=10)  # warm every composition
        t0 = time.perf_counter()
        pend = []
        out = []
        for w in wins:
            pend.append(dix.query_batch_async(w, scorer, top_k=10))
            if len(pend) > 2:
                out.extend(pend.pop(0).get())
        for p in pend:
            out.extend(p.get())
        dt = time.perf_counter() - t0
        assert len(out) == total
        log(f"pipelined W={W}: {total} queries in {dt:.2f}s -> {total / dt:.0f} QPS")


if __name__ == "__main__":
    main()
