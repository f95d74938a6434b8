#!/usr/bin/env python
"""Separate the serving pipeline's three candidate bottlenecks:

  1. device compute per window (submit many, sync once),
  2. D2H fetch of a COMPLETED packed result (tunnel bandwidth),
  3. whether two concurrent fetches share or split the tunnel bandwidth,

and report the pad-row inflation of the packed result (bytes fetched per
window vs the minimum).  Diagnostics only; run on the real TPU.
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu import Index, bm25

    n_docs = int(1e6)
    window = 16384
    t0 = time.time()
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    dix = ix.device_index()
    scorer = bm25.new()
    queries = make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    log(f"setup {time.time() - t0:.0f}s")

    # Warmup / compile.
    for w in windows:
        dix.query_batch(w, scorer, top_k=10)
    log("warm")

    # --- pad inflation ---------------------------------------------------
    h = dix.query_batch_async(windows[0], scorer, top_k=10)
    packed = h._packed
    rows = packed.shape[0]
    log(
        f"packed rows {rows} vs queries {window} "
        f"(inflation {rows / window:.2f}x, {packed.nbytes / 1024:.0f} KB)"
    )
    np.asarray(packed)

    # --- device-only time: submit 6 windows, fetch only the last ---------
    t0 = time.perf_counter()
    hs = []
    for i in range(6):
        hs.append(dix.query_batch_async(windows[i % 2], scorer, top_k=10))
    t_submit = time.perf_counter() - t0
    np.asarray(hs[-1]._packed)
    t_all = time.perf_counter() - t0
    log(
        f"submit 6 windows: {1e3 * t_submit:.0f}ms; "
        f"sync last: {1e3 * t_all:.0f}ms -> device ~{1e3 * t_all / 6:.0f}ms/window"
    )

    # All six are now complete on device.  Fetch cost of completed buffers:
    t0 = time.perf_counter()
    np.asarray(hs[0]._packed)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(hs[1]._packed)
    t2 = time.perf_counter() - t0
    log(f"fetch completed packed: {1e3 * t1:.0f}ms, {1e3 * t2:.0f}ms")

    # Two concurrent fetches of completed buffers (different arrays).
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(lambda: np.asarray(hs[2]._packed))
        f2 = pool.submit(lambda: np.asarray(hs[3]._packed))
        f1.result()
        f2.result()
    t_two = time.perf_counter() - t0
    log(
        f"2 concurrent fetches: {1e3 * t_two:.0f}ms total "
        f"(serial would be ~{1e3 * (t1 + t2):.0f}ms)"
    )

    # get_arrays total (fetch + assembly) on a completed window.
    t0 = time.perf_counter()
    hs[4].get_arrays()
    log(f"get_arrays on completed window: {1e3 * (time.perf_counter() - t0):.0f}ms")

    # D2H size scaling: fetch a half-size slice via device-side slicing.
    half = jax.jit(lambda x: x[: rows // 2])(hs[5]._packed)
    half.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(half)
    log(f"fetch half-size ({half.nbytes / 1024:.0f} KB): {1e3 * (time.perf_counter() - t0):.0f}ms")


if __name__ == "__main__":
    main()
