#!/usr/bin/env python
"""Split the fused kernel's cost: gather+score vs bitonic merge.

Times one shape class with the real merge, then with the merge body
stubbed to a trivial reduction (wrong results, same memory/launch shape).
The difference isolates the sort/scan cost.  Diagnostics only.
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
    import probly_search_tpu.ops.pallas_query as pq

    n_docs = int(1e6)
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 16384, 3)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    dix = ix.device_index()
    plan, _fb = dix.plan_batch(queries, dev.whitespace_tokenizer, scorer)
    nc_bucket = np.array([dev._bucket(int(c), dix.NC_BUCKETS, 4) for c in plan.nchunks])

    real_merge = pq.merge_body

    def stub_merge(k, qterm_bits, key_in, score_in, out_s, out_d, ks, vs, hs, **kw):
        rows = ks.shape[0]
        m = jnp.max(score_in, axis=1, keepdims=True)
        out_s[...] = jnp.broadcast_to(m, (rows, k))
        out_d[...] = jnp.zeros((rows, k), jnp.int32)

    for name, body in (("real", real_merge), ("stub", stub_merge)):
        pq.merge_body = body
        dev._STEP_CACHE.clear()
        for nc in (4, 8, 16):
            members = np.flatnonzero(nc_bucket == nc)[:512]
            if len(members) < 64:
                continue
            qs = [queries[i] for i in members]
            t0 = time.perf_counter()
            dix.query_batch(qs, scorer, top_k=10)
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(3):
                dix.query_batch(qs, scorer, top_k=10)
            run_t = (time.perf_counter() - t0) / 3
            log(
                f"  merge={name} nc={nc:3d} (L={nc * dix.CHUNK:6d}) "
                f"B={len(members):4d}: {1e3 * run_t:7.1f}ms "
                f"({1e6 * run_t / len(members):6.1f}us/q) compile {compile_t:.0f}s"
            )
    pq.merge_body = real_merge


if __name__ == "__main__":
    main()
