#!/usr/bin/env python
"""Build-side headroom probe v2 (VERDICT r3 item 7, fallback).

v1 (r7_build_probe.py) composed sort + associative_scan + cumsum over the
full 8M (term, doc) pair stream into ONE program; its remote compile
stalled past the platform's 45-min pathology wall (PERFORMANCE.md r7).
v2 bounds the device-pack cost FROM BELOW with the smallest viable
program: the variadic `lax.sort` of the 8M pairs alone (the dominant
stage of any device CSR pack), plus the cheap elementwise run-head flags.
If sort alone is not decisively faster than the complete native host
build (~3.5 s), the device-side build pipeline is dead on this platform
regardless of how the bookkeeping stages are engineered.
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

    vocab, cdf, _texts = make_corpus(n_docs, 50_000, 8)
    rng = np.random.default_rng(0)
    ids = np.searchsorted(cdf, rng.random((n_docs, 8)))
    term_flat = np.minimum(ids, len(vocab) - 1).astype(np.int32).reshape(-1)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int32), 8)

    @jax.jit
    def device_sort_heads(term, doc):
        t_s, d_s = jax.lax.sort((term, doc), num_keys=2)
        prev_t = jnp.concatenate([t_s[:1] - 1, t_s[:-1]])
        prev_d = jnp.concatenate([d_s[:1] - 1, d_s[:-1]])
        head = (t_s != prev_t) | (d_s != prev_d)
        return t_s, d_s, head.astype(jnp.int32).sum()  # n_postings

    t0 = time.time()
    term_j = jax.device_put(term_flat)
    doc_j = jax.device_put(doc_of)
    np.asarray(term_j[-1:])
    t_h2d = time.time() - t0
    log(f"H2D {t_h2d:.2f}s")
    t0 = time.time()
    outs = device_sort_heads(term_j, doc_j)
    n_post = int(np.asarray(outs[2]))
    t_first = time.time() - t0
    log(f"first (compile+run) {t_first:.1f}s, n_postings {n_post}")
    reps = []
    for _ in range(3):
        t0 = time.time()
        outs = device_sort_heads(term_j, doc_j)
        np.asarray(outs[2])
        reps.append(time.time() - t0)
    t_sort = sorted(reps)[1]
    log(f"sort+heads median {t_sort:.2f}s (reps {[round(r, 2) for r in reps]})")
    print(
        json.dumps(
            {
                "metric": "build_probe2_sort_only_1M",
                "h2d_s": round(t_h2d, 2),
                "first_compile_run_s": round(t_first, 1),
                "sort_heads_median_s": round(t_sort, 2),
                "n_postings": n_post,
            }
        )
    )


if __name__ == "__main__":
    main()
