#!/usr/bin/env python
"""Window composition experiments: cost of the wide (staged) class, and
pipeline depth / window size matrix — all via the raw columnar drain.
Diagnostics only."""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402

import numpy as np  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25
    import probly_search_tpu.index.device as dev

    n_docs = int(1e6)
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 32768, 3)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    dix = ix.device_index()

    # Identify heavy queries (wide staged class).
    plan, _fb = dix.plan_batch(queries, dev.whitespace_tokenizer, scorer)
    nc_bucket = np.array([dev._bucket(int(c), dix.NC_BUCKETS, 4) for c in plan.nchunks])
    light_idx = np.flatnonzero(nc_bucket <= 16)
    log(
        f"class histogram: "
        f"{dict(zip(*map(list, np.unique(nc_bucket, return_counts=True))))}"
    )

    def run_pipe(qlist, W, depth, passes=2):
        wins = [qlist[i : i + W] for i in range(0, len(qlist), W)]
        wins = [w for w in wins if len(w) == W]
        for w in wins[: max(3, depth)]:
            dix.query_batch(w, scorer, top_k=10)  # warm compile
        t0 = time.perf_counter()
        pend = []
        n = 0
        for _ in range(passes):
            for w in wins:
                pend.append(dix.query_batch_async(w, scorer, top_k=10))
                n += len(w)
                if len(pend) >= depth:
                    pend.pop(0).get_arrays()
        for p in pend:
            p.get_arrays()
        dt = time.perf_counter() - t0
        return n / dt, dt, n

    # Full mix vs light-only at W=8192.
    qps, dt, n = run_pipe(queries[:16384], 8192, 2)
    log(f"full mix   W=8192 depth=2: {qps:7.0f} QPS ({n} queries, {dt:.2f}s)")
    light_qs = [queries[i] for i in light_idx[:16384]]
    qps, dt, n = run_pipe(light_qs, 8192, 2)
    log(f"light-only W=8192 depth=2: {qps:7.0f} QPS ({n} queries, {dt:.2f}s)")

    # Depth / window matrix on the full mix.
    for W, depth in ((16384, 4), (32768, 2), (32768, 3)):
        qps, dt, n = run_pipe(queries, W, depth)
        log(f"full mix   W={W} depth={depth}: {qps:7.0f} QPS ({n} queries, {dt:.2f}s)")


if __name__ == "__main__":
    main()
