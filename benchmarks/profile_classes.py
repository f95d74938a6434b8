#!/usr/bin/env python
"""Per-shape-class microbenchmarks on real hardware.

Isolates where window compute goes: times each nc class separately at
several fused-kernel lane caps, the raw merge kernel at several widths,
and the CHUNK=1024 record layout.  Diagnostics only.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25
    import probly_search_tpu.index.device as dev
    from probly_search_tpu.ops.pallas_merge import merge_scores_topk_pallas
    from probly_search_tpu.ops.merge import merge_scores_topk

    # --- raw merge kernel cost vs width ---------------------------------- #
    log("--- merge kernel: rows x L, pallas vs XLA ---")
    rng = np.random.default_rng(0)
    for rows, L in ((256, 4096), (256, 8192), (128, 16384)):
        key = jnp.asarray(rng.integers(0, 1 << 20, (rows, L), dtype=np.int32))
        sc = jnp.asarray(rng.random((rows, L), dtype=np.float32))
        for name, base_fn in (("pallas", merge_scores_topk_pallas), ("xla", merge_scores_topk)):
            fn = jax.jit(lambda a, b, f=base_fn: f(a, b, 10, 4))
            try:
                t0 = time.perf_counter()
                out = fn(key, sc)
                np.asarray(out[0])
                compile_t = time.perf_counter() - t0
                t0 = time.perf_counter()
                for _ in range(3):
                    out = fn(key, sc)
                np.asarray(out[0])
                run_t = (time.perf_counter() - t0) / 3
                log(
                    f"  merge {name:6s} rows={rows:4d} L={L:6d}: "
                    f"{1e3 * run_t:8.2f}ms/run ({1e6 * run_t / rows:6.1f}us/row) "
                    f"compile {compile_t:.1f}s"
                )
            except Exception as e:  # noqa: BLE001 — report and continue
                log(f"  merge {name} rows={rows} L={L}: FAILED {type(e).__name__}: {e}")

    # --- full engine per class -------------------------------------------- #
    n_docs = int(1e6)
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 16384, 3)
    for chunk in (1024,):
        from probly_search_tpu import IndexConfig

        ix = Index(1, config=IndexConfig(chunk_size=chunk))
        ix.add_documents_columnar(list(range(n_docs)), [texts])
        scorer = bm25.new()
        dix = ix.device_index()
        plan, _fb = dix.plan_batch(queries, dev.whitespace_tokenizer, scorer)
        nc_bucket = np.array(
            [dev._bucket(int(c), dix.NC_BUCKETS, 4) for c in plan.nchunks]
        )
        log(f"--- CHUNK={chunk}: class histogram "
            f"{dict(zip(*map(list, np.unique(nc_bucket, return_counts=True))))}")
        for cap in (16384,):
            dev._FUSED_MAX_LANES = cap
            dev._STEP_CACHE.clear()
            for nc in np.unique(nc_bucket):
                nc = int(nc)
                members = np.flatnonzero(nc_bucket == nc)[:512]
                if len(members) < 32:
                    continue
                qs = [queries[i] for i in members]
                t0 = time.perf_counter()
                dix.query_batch(qs, scorer, top_k=10)
                compile_t = time.perf_counter() - t0
                t0 = time.perf_counter()
                n = 3
                for _ in range(n):
                    dix.query_batch(qs, scorer, top_k=10)
                run_t = (time.perf_counter() - t0) / n
                fused = nc * chunk <= cap and (nc * chunk & (nc * chunk - 1)) == 0
                log(
                    f"  cap={cap:6d} nc={nc:4d} (L={nc * chunk:6d}, "
                    f"{'fused' if fused else 'staged'}) B={len(members):4d}: "
                    f"{1e3 * run_t:8.1f}ms ({1e6 * run_t / len(members):6.1f}us/q) "
                    f"compile {compile_t:.1f}s"
                )
        dev._FUSED_MAX_LANES = 32768


if __name__ == "__main__":
    main()
