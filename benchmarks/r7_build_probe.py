#!/usr/bin/env python
"""Build-side headroom probe (VERDICT r3 item 7): host CSR pack vs a
device segmented-sort pack at 1M docs.

SURVEY §2 row 4 maps `add_document` (/root/reference/src/index.rs:77-158)
to a device hash -> segmented-sort -> CSR-pack pipeline; the shipping build
is host-side (C++ one-shot tokenize+intern+counting-sort CSR,
native/psearch_native.cpp — 115-178k docs/s at the 1M bench corpus).  This
probe measures what a device pack would actually buy on THIS platform,
where every device interaction crosses a high-latency tunnel:

  stage H (shipping): texts -> native C++ CSR  (tokenize+intern+pack)
  stage D (probe):    token ids (host, from the same native tokenize) ->
                      H2D -> device lax.sort of (term, doc) pairs ->
                      run-length tf counts -> CSR offsets (cumsum) ->
                      posting record rows materialized ON DEVICE
                      (what DeviceIndex H2Ds today) -> timed with and
                      without the D2H of the CSR (an index kept on device
                      never drains it)

A parallelized C++ pass is NOT probed: this host has one core (nproc=1,
CLAUDE.md) — thread parallelism cannot help here; noted for the record.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import log, make_corpus  # noqa: E402


def main(n_docs=1_000_000):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)

    # --- stage H: the shipping native one-shot CSR build ----------------- #
    from probly_search_tpu import Index

    t0 = time.time()
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    t_host = time.time() - t0
    log(f"H: native host CSR build {t_host:.2f}s ({n_docs / t_host:.0f} docs/s)")
    t0 = time.time()
    dix = ix.device_index()
    t_snap = time.time() - t0
    log(f"H: device snapshot (rec H2D) {t_snap:.2f}s")

    # --- stage D: device segmented-sort pack ----------------------------- #
    # Host tokenize+intern via the same native pass (strings cannot cross
    # to the device); the probe isolates the SORT+PACK portion the survey
    # proposed to move on-device.
    from probly_search_tpu.native.build import tokenize_csr_native

    t0 = time.time()
    res = tokenize_csr_native(texts)
    t_tok = time.time() - t0
    if res is None:
        log("native tokenizer unavailable; abort")
        return
    # tokenize_csr_native returns the FULL CSR already (counting-sort in
    # C++).  For the device probe we need the raw (doc, term) pairs; rebuild
    # them from the per-doc token-id stream the corpus generator implies
    # (same Zipf draw the corpus was made from — identical distribution).
    rng = np.random.default_rng(0)
    ids = np.searchsorted(cdf, rng.random((n_docs, 8)))
    ids = np.minimum(ids, len(vocab) - 1).astype(np.int32)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int32), 8)
    term_flat = ids.reshape(-1)
    log(f"D: host tokenize+intern (native) {t_tok:.2f}s; pairs {len(term_flat)/1e6:.1f}M")

    V = len(vocab)

    @jax.jit
    def device_pack(term, doc):
        # sort by (term, doc): one composite int64-free 2-key sort
        t_s, d_s = jax.lax.sort((term, doc), num_keys=2)
        # dedup per (term, doc): tf = run length (occurrences)
        prev_t = jnp.concatenate([t_s[:1] - 1, t_s[:-1]])
        prev_d = jnp.concatenate([d_s[:1] - 1, d_s[:-1]])
        head = (t_s != prev_t) | (d_s != prev_d)
        # postings = heads; tf via segmented count: position - segment start
        pos = jnp.arange(term.shape[0], dtype=jnp.int32)
        seg_start = jnp.where(head, pos, 0)
        seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
        run_len = pos - seg_start + 1
        # tail of each run carries the final tf
        nxt = jnp.concatenate([head[1:], jnp.ones(1, bool)])
        # compact: postings in (term, doc) order == CSR posting order
        n_post = jnp.cumsum(head.astype(jnp.int32))
        df = jnp.zeros(V, jnp.int32).at[t_s].add(nxt.astype(jnp.int32))
        offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(df)])
        return t_s, d_s, head, run_len, nxt, n_post, offsets

    # warm (compile)
    t_dev = jnp.asarray(term_flat[:1024])
    d_dev = jnp.asarray(doc_of[:1024])
    # compile the FULL shape directly (the small shape is a different jit)
    t0 = time.time()
    term_j = jax.device_put(term_flat)
    doc_j = jax.device_put(doc_of)
    np.asarray(term_j[-1:])
    t_h2d = time.time() - t0
    t0 = time.time()
    outs = device_pack(term_j, doc_j)
    np.asarray(outs[-1][-1:])
    t_compile_run = time.time() - t0
    # timed reps (program cached now)
    reps = []
    for _ in range(3):
        t0 = time.time()
        outs = device_pack(term_j, doc_j)
        np.asarray(outs[-1][-1:])  # sync on a tiny slice: no bulk D2H
        reps.append(time.time() - t0)
    t_pack = sorted(reps)[1]
    # optional drain (a host index would need the CSR back)
    t0 = time.time()
    _ = [np.asarray(o) for o in outs[:2]]
    t_d2h = time.time() - t0
    log(
        f"D: H2D {t_h2d:.2f}s  first(compile+run) {t_compile_run:.1f}s  "
        f"pack median {t_pack:.2f}s  optional D2H {t_d2h:.2f}s"
    )
    total_dev = t_tok + t_h2d + t_pack
    log(
        f"D: device-resident total {total_dev:.2f}s ({n_docs / total_dev:.0f} docs/s) "
        f"vs host {t_host:.2f}s ({n_docs / t_host:.0f} docs/s)"
    )
    print(
        json.dumps(
            {
                "metric": "build_probe_1M",
                "host_native_s": round(t_host, 2),
                "host_snapshot_h2d_s": round(t_snap, 2),
                "device_tokenize_s": round(t_tok, 2),
                "device_h2d_s": round(t_h2d, 2),
                "device_pack_s": round(t_pack, 2),
                "device_optional_d2h_s": round(t_d2h, 2),
                "device_total_s": round(total_dev, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
