#!/usr/bin/env python
"""Sharded-path smoke on the REAL TPU backend (VERDICT r3 item 9).

A 1-device `jax.sharding.Mesh` on the single real chip exercises the whole
sharded stack — `shard_map`, the collective top-k plan, and the fused
Pallas kernel under `check_vma=False` — on the real Mosaic backend, which
the virtual CPU mesh structurally cannot (the CPU mesh skips the fused
branch; parallel/dist_query.py documents the hazard).  Run this after any
change to the sharded path; it is cheap (50k docs, two 512-query windows)
apart from the one-time remote compile.

Prints one JSON line: {"sharded_onchip": ok, "recall": r, "window_s": ...}.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus, make_queries  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    devs = jax.devices()
    log(f"devices: {devs}")
    assert devs and devs[0].platform != "cpu", "must run on the real chip"

    from probly_search_tpu import Index, IndexConfig, bm25, whitespace_tokenizer
    from probly_search_tpu.parallel import ShardedDeviceIndex, make_mesh

    n_docs, window, top_k = 50_000, 512, 10
    vocab, cdf, texts = make_corpus(n_docs, 20_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    queries = make_queries(vocab, cdf, window * 2, 3)
    scorer = bm25.new()

    mesh = make_mesh(data=1, docs=1)
    t0 = time.time()
    sdix = ShardedDeviceIndex(ix, mesh)
    log(f"sharded snapshot (1-device mesh): {time.time() - t0:.1f}s")

    t1 = time.time()
    _s, slots, keys = sdix.query_batch_async(
        queries[:window], scorer, top_k=top_k
    ).get_arrays()
    warm_s = time.time() - t1
    log(f"first sharded window (incl. compiles): {warm_s:.1f}s")
    t2 = time.time()
    _s2, slots2, keys2 = sdix.query_batch_async(
        queries[window:], scorer, top_k=top_k
    ).get_arrays()
    window_s = time.time() - t2
    log(f"second sharded window: {window_s:.2f}s")

    # Recall vs the exact f64 oracle on a 64-query sample.
    hits = total = 0
    for qi in range(64):
        oracle = ix.query(queries[qi], bm25.new(), whitespace_tokenizer, [1.0])[:top_k]
        o_keys = {r.key for r in oracle}
        d_keys = {int(k) for k, sl in zip(keys[qi], slots[qi]) if sl >= 0}
        hits += len(o_keys & d_keys)
        total += len(o_keys)
    recall = hits / max(total, 1)
    log(f"recall@{top_k} vs oracle on 64 queries: {recall:.4f}")

    # z2o fused-kernel smoke on the real Mosaic backend (the [G,1] SMEM
    # liveness table is shared lowering with the BM25 kernel but compiles
    # as its own program — session 3 only exercised the BM25 side).
    from probly_search_tpu import zero_to_one
    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async

    dix = ix.device_index()
    t3 = time.time()
    _zs, zslots, zkeys = z2o_query_batch_async(
        dix, queries[:256], whitespace_tokenizer, top_k
    ).get_arrays()
    z2o_s = time.time() - t3
    zhits = ztotal = 0
    for qi in range(64):
        oracle = ix.query(queries[qi], zero_to_one.new(), whitespace_tokenizer, [1.0])[:top_k]
        o_keys = {r.key for r in oracle}
        d_keys = {int(k) for k, sl in zip(zkeys[qi], zslots[qi]) if sl >= 0}
        zhits += len(o_keys & d_keys)
        ztotal += len(o_keys)
    z_recall = zhits / max(ztotal, 1)
    log(f"z2o fused window on chip: {z2o_s:.1f}s, recall {z_recall:.4f}")

    print(
        json.dumps(
            {
                "sharded_onchip": True,
                "recall": round(recall, 4),
                "first_window_s": round(warm_s, 1),
                "window_s": round(window_s, 2),
                "z2o_onchip_recall": round(z_recall, 4),
                "z2o_window_s": round(z2o_s, 1),
            }
        )
    )
    assert recall == 1.0, recall
    assert z_recall == 1.0, z_recall


if __name__ == "__main__":
    main()
