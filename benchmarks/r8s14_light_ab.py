"""r8 session 14: light shape classes on the 1M headline bench (hardware).

The r8s13 lane census: 37.6% of chunk-grid lanes are in-chunk tail pad,
concentrated in light classes (NC=3 at 21.6% payload); payload is 56.7%
of merged class width.  Light classes re-class those queries at
C=256 (config.light_chunk_size), cutting merged lanes ~20-30%; device
compute is ~linear in lanes, so the device-stream pace should drop well
below the 48 ms/window floor.

A/B: two engines over the same corpus (light on / off), interleaved
queue-8 pace probes (the weather-invariant metric) + serving sections +
on-chip slots equality.

Run: python benchmarks/r8s14_light_ab.py 2>&1 | tee /tmp/r8s14.log
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
    keys = list(range(n_docs))
    ix_on = Index(1, config=IndexConfig(result_format="slots20"))
    ix_on.add_documents_columnar(keys, [texts])
    ix_off = Index(
        1, config=IndexConfig(result_format="slots20", light_chunk_size=0)
    )
    ix_off.add_documents_columnar(keys, [texts])
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    th.join()
    dix_on = ix_on.device_index()
    dix_off = ix_off.device_index()
    log(f"snapshots t+{time.time() - t0:.1f}s")

    for name, dix in (("off", dix_off), ("on", dix_on)):
        t_w = time.time()
        for w in windows:
            dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
        log(f"warm[{name}] {time.time() - t_w:.1f}s")

    # On-chip equality: same window, both engines, identical ranked slots.
    _s, sl_a, k_a = dix_on.query_batch_async(
        windows[0], scorer, top_k=top_k
    ).get_arrays()
    _s, sl_b, k_b = dix_off.query_batch_async(
        windows[0], scorer, top_k=top_k
    ).get_arrays()
    eq = np.array_equal(sl_a, sl_b)
    log(f"slots bit-equal on-chip: {eq}")
    if not eq:
        bad = np.nonzero((sl_a != sl_b).any(axis=1))[0]
        log(f"  MISMATCH rows: {bad[:10]} of {len(bad)}")

    def pace(dix):
        def queue_n(n):
            t_s = time.perf_counter()
            hs = [
                dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
                for i in range(n)
            ]
            np.asarray(hs[-1]._packed)
            dt = 1e3 * (time.perf_counter() - t_s)
            for h in hs:
                h.get_arrays()
            return dt

        t1 = min(queue_n(1) for _ in range(2))
        t8 = min(queue_n(8) for _ in range(2))
        return (t8 - t1) / 7.0

    from concurrent.futures import ThreadPoolExecutor

    def section(dix, n_passes=6):
        def drain_pair(pair):
            for h in pair:
                h.get_arrays()

        t5 = time.perf_counter()
        n_total = 0
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs, pending = [], []
            for p in range(n_passes):
                for w in windows:
                    pending.append(
                        dix.query_batch_async(w, scorer, top_k=top_k)
                    )
                    n_total += len(w)
                    if len(pending) == 2:
                        futs.append(pool.submit(drain_pair, pending))
                        pending = []
                    while len(futs) >= 2:
                        futs.pop(0).result()
            if pending:
                futs.append(pool.submit(drain_pair, pending))
            for f in futs:
                f.result()
        return n_total / (time.perf_counter() - t5)

    log("== interleaved pace + sections ==")
    p_on, p_off, q_on, q_off = [], [], [], []
    for rep in range(3):
        p_off.append(pace(dix_off))
        p_on.append(pace(dix_on))
        q_off.append(section(dix_off))
        q_on.append(section(dix_on))
        log(
            f"  rep{rep}: pace off {p_off[-1]:.1f} vs on {p_on[-1]:.1f} ms/w; "
            f"section off {q_off[-1]:.0f} vs on {q_on[-1]:.0f} QPS"
        )
    log(
        f"median pace off {np.median(p_off):.1f} vs ON {np.median(p_on):.1f} "
        f"ms/window; section off {np.median(q_off):.0f} vs ON "
        f"{np.median(q_on):.0f} QPS"
    )

    # Oracle recall on the light engine (64-query sample).
    from probly_search_tpu import whitespace_tokenizer

    sample = queries[:64]
    _s, s_slots, s_keys = dix_on.query_batch_async(
        sample, scorer, top_k=top_k
    ).get_arrays()
    hits = total = 0
    for qi, q in enumerate(sample):
        oracle = ix_on.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:top_k]
        o_keys = {r.key for r in oracle}
        d_keys = {int(kk) for kk, sl in zip(s_keys[qi], s_slots[qi]) if sl >= 0}
        hits += len(o_keys & d_keys)
        total += len(o_keys)
    log(f"recall@10 (light engine) {hits / max(total, 1):.4f}")
    log(f"done t+{time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
