#!/usr/bin/env python
"""r7 session 1 (hardware): sharded on-chip smoke + lane-quantum probe.

Phase A (VERDICT r3 item 9): execute one sharded BM25 window and one z2o
window on a 1-device mesh on the REAL chip — `shard_map` + the fused Pallas
kernel + `check_vma=False` on the TPU backend, the path no CPU test can
reach (dist_query.py hazard note).

Phase B (VERDICT r3 item 2): lane-quantum probe.  Host accounting
(benchmarks/lane_waste_analysis.py) says the shipping C=1024 scheme gathers
only 56.8% useful lanes on the 1M bench window; Q=512 cuts window lanes
-21%, Q=256 -28%.  Device compute is ~linear in lanes, so this should map
~1:1 onto device pace — UNLESS the 2-4x DMA count at smaller quanta bites
(the r3 C=512 A/B lost 12%, attribution unclear).  The fused kernel is
already generic over pow-2 chunk widths, so each mode is just
config.chunk_size + a geometric NC ladder.  We time every class of the
REAL bench window per mode (queue-8 marginal, interleaved reps) and report
the lane-weighted window device cost per mode.

Run: one process, pipe to a file (first-ever class shapes pay remote
compiles of 30-120 s each).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus, make_queries  # noqa: E402


def phase_a_sharded_smoke():
    import jax
    import random

    from probly_search_tpu import Index, bm25, whitespace_tokenizer
    from probly_search_tpu.models.zero_to_one import ZeroToOne
    from probly_search_tpu.parallel import ShardedDeviceIndex
    from jax.sharding import Mesh

    rng = random.Random(5)
    vocab = ["w%02d" % i for i in range(40)] + ["pan", "pancake", "panel"]
    ix = Index(1)
    texts = [" ".join(rng.choice(vocab) for _ in range(5)) for _ in range(2000)]
    ix.add_documents_columnar(list(range(2000)), [texts])
    dev = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(dev, ("data", "docs"))
    sdix = ShardedDeviceIndex(ix, mesh)
    queries = ["pan", "w07 w11", "w01 w02 w03", "panel w05"] * 64
    t0 = time.time()
    rows = sdix.query_batch(queries, bm25.new(), top_k=5)
    ok = 0
    for q, row in zip(queries[:4], rows[:4]):
        want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0], top_k=5)
        assert [r.key for r in row] == [r.key for r in want], (q, row, want)
        for a, b in zip(row, want):
            assert abs(a.score - b.score) < 2e-5 * max(1.0, abs(b.score)), q
        ok += 1
    log(f"A: sharded BM25 on-chip 1-dev mesh OK ({ok} queries checked, "
        f"{time.time() - t0:.1f}s incl. compiles)")

    h = sdix.query_batch_z2o(queries[:64], tokenizer=whitespace_tokenizer, top_k=5)
    sc, sl, ks = h.get_arrays()
    for qi, q in enumerate(queries[:4]):
        want = ZeroToOne.vectorized_query(ix, q, whitespace_tokenizer, top_k=5)
        got = [int(k) for k, s in zip(ks[qi], sl[qi]) if s >= 0]
        assert got == [r.key for r in want], (q, got, [r.key for r in want])
    log("A: sharded z2o on-chip 1-dev mesh OK")
    print(json.dumps({"phase": "A", "sharded_onchip": "ok"}), flush=True)


GEO_UNITS = [2, 3, 4, 5, 6, 7, 8, 10, 13, 17, 22, 28, 35, 44, 55, 64]


def geo_ladder(Q):
    return tuple(u for u in GEO_UNITS if u * Q <= 16384) + tuple(
        u for u in (16384 // Q * 2, 16384 // Q * 4, 16384 // Q * 16) if u
    )


def phase_b_quantum_probe(n_docs=1_000_000):
    import jax

    from probly_search_tpu import Index, IndexConfig, bm25

    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 16384, 3)
    scorer = bm25.new()

    t0 = time.time()
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    log(f"B: 1M index build {time.time() - t0:.1f}s")

    # Per mode: plan + pack the window, jit each class's dispatch program.
    modes = {}
    for name, Q in (("c1024", 1024), ("q512", 512), ("q256", 256)):
        cfg_ix = ix
        cfg_ix.config.chunk_size = Q
        dix = cfg_ix.device_index()
        if Q != 1024:
            dix.nc_buckets = geo_ladder(Q)
            dix.nc_min = 2
        plan, fb = dix.plan_batch(queries, whitespace_tokenizer, scorer)
        assert not fb
        packs = dix.pack_dispatches(len(queries), plan)
        total_lanes = 0
        classes = []
        for idxs, jobs_flat, nc, nj, rng_ in packs:
            b_pad = jobs_flat.shape[0]
            total_lanes += b_pad * nc * Q
            classes.append((idxs, jobs_flat, nc, nj, rng_))
        log(
            f"B[{name}]: {len(classes)} class-dispatches, "
            f"{total_lanes / 1e6:.1f}M padded lanes "
            f"(classes: {sorted(set((c[2], c[1].shape[0]) for c in classes))})"
        )
        modes[name] = (dix, classes, total_lanes, Q)

    from probly_search_tpu.index.device import _query_step_impl

    # jit per (mode, class shape); share across identical shapes.
    def make_step(dix, Q, nc, nj, rng_):
        qb = dix._qterm_bits

        def step(rec, field_avg, fields_boost, jobs_flat):
            return _query_step_impl(
                scorer, Q, 10, qb, 1, nc, rec, field_avg, fields_boost,
                jobs_flat, use_ranges=rng_,
            )

        return jax.jit(step)

    # Warm (compile) every class program per mode; survive per-class
    # compile failures (remote-compiler walls) and report them.
    results = {}
    for name, (dix, classes, total_lanes, Q) in modes.items():
        assert not any(c[4] for c in classes), "bench window has range classes?"
        boosts = np.ones(1, np.float32)
        steps = {}
        failed = []
        for idxs, jobs_flat, nc, nj, rng_ in classes:
            key = (nc, nj, jobs_flat.shape[0], rng_)
            if key in steps or key in failed:
                continue
            t1 = time.time()
            try:
                stp = make_step(dix, Q, nc, nj, rng_)
                s, d = stp(
                    dix.rec,
                    dix.field_avg,
                    jax.numpy.asarray(boosts),
                    jax.numpy.asarray(jobs_flat.reshape(-1)),
                )
                np.asarray(d)  # force
                steps[key] = stp
                log(f"B[{name}] compile {key}: {time.time() - t1:.1f}s")
            except Exception as e:  # noqa: BLE001
                failed.append(key)
                log(f"B[{name}] compile FAILED {key}: {type(e).__name__} {e}")
        results[name] = (steps, failed)

    # Interleaved timing: per rep, per mode, run every class queue-8.
    def time_mode(name):
        dix, classes, total_lanes, Q = modes[name]
        steps = results[name][0]
        boosts = jax.numpy.ones(1, jax.numpy.float32)
        total_ms = 0.0
        per_class = []
        for idxs, jobs_flat, nc, nj, rng_ in classes:
            key = (nc, nj, jobs_flat.shape[0], rng_)
            stp = steps.get(key)
            if stp is None:
                per_class.append((key, None))
                continue
            jf = jax.numpy.asarray(jobs_flat.reshape(-1))
            # queue-8 marginal: one submit+sync, then 8 and subtract.
            outs = stp(dix.rec, dix.field_avg, boosts, jf)
            np.asarray(outs[1])
            t1 = time.perf_counter()
            o = [stp(dix.rec, dix.field_avg, boosts, jf) for _ in range(8)]
            np.asarray(o[-1][1])
            t8 = time.perf_counter() - t1
            t1 = time.perf_counter()
            o = stp(dix.rec, dix.field_avg, boosts, jf)
            np.asarray(o[1])
            t1w = time.perf_counter() - t1
            ms = 1e3 * (t8 - t1w) / 7.0
            total_ms += ms
            per_class.append((key, round(ms, 2)))
        return total_ms, per_class

    reps = {n: [] for n in modes}
    detail = {}
    for rep in range(5):
        for name in modes:
            tot, per_class = time_mode(name)
            reps[name].append(tot)
            detail[name] = per_class
            log(f"B rep{rep} [{name}]: window device sum {tot:.1f} ms")
    out = {"phase": "B", "n_docs": n_docs}
    for name in modes:
        med = sorted(reps[name])[len(reps[name]) // 2]
        out[name] = {
            "window_device_ms_median": round(med, 1),
            "reps": [round(r, 1) for r in reps[name]],
            "padded_lanes_M": round(modes[name][2] / 1e6, 1),
            "classes": [[list(map(int, k[:3])) + [bool(k[3])], v] for k, v in detail[name]],
            "compile_failures": [list(map(int, k[:3])) + [bool(k[3])] for k in results[name][1]],
        }
    print(json.dumps(out), flush=True)
    # (rank parity across modes is checked end-to-end in the serving A/B
    # next session; the class programs here share _query_step_impl, whose
    # CPU/interpret parity suite covers chunk widths 256/512/1024.)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    phase_a_sharded_smoke()
    phase_b_quantum_probe()


if __name__ == "__main__":
    main()
