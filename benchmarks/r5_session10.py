#!/usr/bin/env python
"""Round-3 TPU session 10: in-kernel phase split + wide-class lanes path.

Session 9's device trace split the 83 ms window by CLASS; this session
splits the fused kernel by PHASE (DMA gather / scoring / merge network /
segmented scans / top-k) on the two expensive shapes (NC=16 and NC=8),
and A/Bs the new wide-class path (Pallas gather+score -> staged XLA
merge) against the old sequential-slice-gather staged path at NC=32.

Timing: queue-M submissions of one jitted program, one sync (executions
serialize on the device, session 8); variants interleaved round-robin in
one process.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


P_TOTAL = 7_463_361  # rec width of the 1M-doc bench (session 9 trace)
C = 1024
CP = C - 128


def synth_rec(rng):
    rec = np.zeros((4, P_TOTAL), np.int32)
    rec[0] = np.arange(P_TOTAL, dtype=np.int32) % (1 << 20)  # doc slots
    rec[1] = rng.integers(1, 4, P_TOTAL, dtype=np.int32)  # tf
    rec[2] = np.float32(8.0).view(np.int32)  # field length bits
    rec[3] = 1  # alive
    return rec


def synth_tables(rng, B, NC):
    c_start = (rng.integers(0, (P_TOTAL - C) // 128, (B, NC), dtype=np.int32)) * 128
    c_skip = rng.integers(0, 128, (B, NC), dtype=np.int32)
    c_len = np.full((B, NC), CP, np.int32)
    c_qterm = (np.arange(NC, dtype=np.int32) * 3 // NC)[None].repeat(B, 0)
    c_scale = np.ones((B, NC), np.float32)
    return c_start, c_skip, c_len, c_qterm, c_scale


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    from probly_search_tpu.models import bm25
    from probly_search_tpu.ops.pallas_query import fused_query_topk
    from probly_search_tpu.index import device as dev

    scorer = bm25.new()
    rng = np.random.default_rng(0)
    rec = jax.device_put(synth_rec(rng))
    scalars = jax.device_put(np.array([[8.0, 1.0]], np.float32))
    out = {}

    def qtime(fn, args, M=20, warm=True):
        if warm:
            r = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0])
        t0 = time.time()
        hs = [fn(*args) for _ in range(M)]
        np.asarray(jax.tree_util.tree_leaves(hs[-1])[0])
        return (time.time() - t0) / M * 1e3

    # ---- part 1: phase split --------------------------------------------
    shapes = [(1024, 16), (2048, 8)]
    phases = ["gather", "score", "sort", "scan", "full"]
    progs = {}
    for B, NC in shapes:
        tabs = [jax.device_put(a) for a in synth_tables(rng, B, NC)]
        for ph in phases:
            f = jax.jit(
                lambda cs, ck, cl, cq, csc, _ph=ph: fused_query_topk(
                    scorer, rec, cs, ck, cl, cq, csc, scalars,
                    chunk=C, k=10, qterm_bits=4, num_fields=1, phase=_ph,
                )
            )
            t0 = time.time()
            r = f(*tabs)
            np.asarray(r[0])
            log(f"compiled+ran ({B},{NC}) {ph} in {time.time()-t0:.1f}s")
            progs[(B, NC, ph)] = (f, tabs)

    res = {key: [] for key in progs}
    for rep in range(3):
        for key, (f, tabs) in progs.items():
            res[key].append(qtime(f, tabs, M=12, warm=False))
    for B, NC in shapes:
        row = {}
        for ph in phases:
            med = float(np.median(res[(B, NC, ph)]))
            row[ph] = round(med, 2)
        out[f"phase_ms_B{B}_NC{NC}"] = row
        log(f"B={B} NC={NC}: {row}")

    # ---- part 2: wide class NC=32 old vs new ----------------------------
    B32, NC32 = 128, 32
    tabs32 = [jax.device_put(a) for a in synth_tables(rng, B32, NC32)]
    favg = jax.device_put(np.array([8.0], np.float32))
    fb = jax.device_put(np.array([1.0], np.float32))

    # old path: XLA vmap slice gather + score + presorted merge
    from probly_search_tpu.ops.merge import merge_scores_topk_presorted
    from probly_search_tpu.index.device import ScoreLanes

    def old_wide(cs, ck, cl, cq, csc):
        B, NC = cs.shape

        def one(s):
            return jax.lax.dynamic_slice(rec, (0, s), (4, C))

        g = jax.vmap(jax.vmap(one))(cs)
        doc = g[:, :, 0, :]
        tf = g[:, :, 1:2, :].astype(jnp.float32)
        flen = jax.lax.bitcast_convert_type(g[:, :, 2:3, :], jnp.float32)
        alive = g[:, :, 3, :]
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, NC, C), 2)
        in_pay = (pos >= ck[..., None]) & (pos < (ck + cl)[..., None])
        live = in_pay & (alive > 0)
        lanes = ScoreLanes(
            tf=tf, field_length=flen, field_avg=favg, fields_boost=fb,
            scale=jnp.broadcast_to(csc[..., None], (B, NC, C)),
            doc=doc, live=live, qterm=cq,
        )
        score = scorer.device_score_lanes(lanes)
        score = jnp.where(score > 0.0, score, 0.0)
        score = jnp.where(in_pay, score, 0.0)
        score = jnp.where(in_pay & jnp.logical_not(alive > 0), -jnp.inf, score)
        key = jnp.where(
            in_pay, (doc << 4) | cq[..., None],
            jnp.where(pos < ck[..., None], -1, dev.INVALID_KEY),
        )
        L = NC * C
        return merge_scores_topk_presorted(
            key.reshape(B, L), score.reshape(B, L), 10, 4, C, True
        )

    def new_wide(cs, ck, cl, cq, csc):
        score_l, key_l = fused_query_topk(
            scorer, rec, cs, ck, cl, cq, csc, scalars,
            chunk=C, k=10, qterm_bits=4, num_fields=1, phase="lanes",
        )
        return merge_scores_topk_presorted(key_l, score_l, 10, 4, C, True)

    f_old = jax.jit(old_wide)
    f_new = jax.jit(new_wide)
    t0 = time.time()
    r_old = [np.asarray(x) for x in f_old(*tabs32)]
    log(f"old wide compiled+ran in {time.time()-t0:.1f}s")
    t0 = time.time()
    r_new = [np.asarray(x) for x in f_new(*tabs32)]
    log(f"new wide compiled+ran in {time.time()-t0:.1f}s")
    same_docs = np.array_equal(r_old[1], r_new[1])
    err = float(
        np.nanmax(
            np.abs(
                np.where(np.isfinite(r_old[0]), r_old[0], 0)
                - np.where(np.isfinite(r_new[0]), r_new[0], 0)
            )
        )
    )
    out["wide_parity"] = {"same_docs": bool(same_docs), "max_abs_err": err}
    log(f"wide parity: docs equal={same_docs} max_abs_err={err:.2e}")

    olds, news = [], []
    for rep in range(5):
        olds.append(qtime(f_old, tabs32, M=12, warm=False))
        news.append(qtime(f_new, tabs32, M=12, warm=False))
    out["wide_ms_old"] = [round(x, 2) for x in olds]
    out["wide_ms_new"] = [round(x, 2) for x in news]
    log(f"wide old {np.median(olds):.2f} ms, new {np.median(news):.2f} ms")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
