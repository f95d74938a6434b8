#!/usr/bin/env python
"""Split the fused kernel's merge cost by phase: odd-even merge levels,
segmented scans, iterative top-k.  Monkeypatches merge_body with truncated
variants (wrong results, same shapes) and times the modal shape classes on
the live 1M-doc workload.  Diagnostics only; run on the real TPU.
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
    import probly_search_tpu.ops.pallas_merge as pm

    n_docs = int(1e6)
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 16384, 3)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    dix = ix.device_index()
    plan, _fb = dix.plan_batch(queries, dev.whitespace_tokenizer, scorer)
    nc_bucket = np.array([dev._bucket(int(c), dix.NC_BUCKETS, 4) for c in plan.nchunks])
    counts = {int(nc): int((nc_bucket == nc).sum()) for nc in np.unique(nc_bucket)}
    log(f"class histogram (nc -> queries): {counts}")

    real = pm.merge_body

    def make_variant(do_merge, do_scans, do_topk):
        def body(k, qterm_bits, key_in, score_in, out_s, out_d, ks, vs, hs, run=0, excl=False):
            rows, L = ks.shape
            pos = pm._lane_iota(rows, L)
            ks[...] = key_in
            vs[...] = score_in
            if do_merge and 0 < run < L:
                pm._oddeven_merge_runs_inplace(ks, vs, pos, run)
            key = ks[...]
            if do_scans:
                hs[...] = (key != pm._shift_right(key, pos, 1, -1)).astype(jnp.int32)
                pm._segmented_scan_inplace(jnp.maximum, vs, hs, pos, pm._NEG_INF)
                tail1 = key != pm._shift_left(key, pos, 1, -1)
                vs[...] = jnp.where(tail1, vs[...], 0.0)
                doc = key >> qterm_bits
                hs[...] = (doc != pm._shift_right(doc, pos, 1, -1)).astype(jnp.int32)
                pm._segmented_scan_inplace(jnp.add, vs, hs, pos, 0.0)
            if do_topk:
                doc = key >> qterm_bits
                col = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
                acc_s = jnp.full((rows, k), pm._NEG_INF, jnp.float32)
                acc_d = jnp.full((rows, k), -1, jnp.int32)
                for i in range(k):
                    vals = vs[...]
                    m = jnp.max(vals, axis=1, keepdims=True)
                    ismax = vals == m
                    idx = jnp.min(jnp.where(ismax, pos, L), axis=1, keepdims=True)
                    sel = pos == idx
                    d_sel = jnp.max(jnp.where(sel, doc, -1), axis=1, keepdims=True)
                    acc_s = jnp.where(col == i, m, acc_s)
                    acc_d = jnp.where(col == i, d_sel, acc_d)
                    vs[...] = jnp.where(sel, pm._NEG_INF, vals)
                out_s[...] = acc_s
                out_d[...] = acc_d
            else:
                m = jnp.max(vs[...], axis=1, keepdims=True)
                out_s[...] = jnp.broadcast_to(m, (rows, k))
                out_d[...] = jnp.zeros((rows, k), jnp.int32)

        return body

    variants = (
        ("full", real),
        ("merge+scans", make_variant(True, True, False)),
        ("merge_only", make_variant(True, False, False)),
        ("none", make_variant(False, False, False)),
    )
    for name, body in variants:
        pm.merge_body = body
        pq.merge_body = body
        dev._STEP_CACHE.clear()
        for nc in (4, 8):
            members = np.flatnonzero(nc_bucket == nc)[:2048]
            if len(members) < 256:
                continue
            qs = [queries[i] for i in members]
            t0 = time.perf_counter()
            dix.query_batch(qs, scorer, top_k=10)
            compile_t = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(4):
                h = dix.query_batch_async(qs, scorer, top_k=10)
                h.get_arrays(want_keys=False)
            run_t = (time.perf_counter() - t0) / 4
            log(
                f"  {name:12s} nc={nc:3d} (L={nc * dix.CHUNK:6d}) B={len(members):5d}: "
                f"{1e3 * run_t:7.1f}ms ({1e6 * run_t / len(members):6.1f}us/q) "
                f"compile {compile_t:.0f}s"
            )
    pm.merge_body = real
    pq.merge_body = real


if __name__ == "__main__":
    main()
