#!/usr/bin/env python
"""Profile ShardedDeviceIndex._pack_window in isolation (host-only).

VERDICT r4 item 3 follow-up: the vectorized pack measured 13.6 ms per
2048-query window inside benchmarks/sharded_serving.py (down from 48.7);
this probe times the pack alone (no device dispatch) and prints a cProfile
split so the residual cost is attributable.  Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/profile_sharded_pack.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from probly_search_tpu import Index, bm25, whitespace_tokenizer
    from probly_search_tpu.parallel import ShardedDeviceIndex, make_mesh

    n_docs, window = 50_000, 2048
    rng = np.random.default_rng(3)
    vocab = np.array(["w%05d" % i for i in range(20_000)])
    weights = 1.0 / np.arange(1, len(vocab) + 1) ** 1.07
    cdf = np.cumsum(weights)
    cdf /= cdf[-1]
    ids = np.searchsorted(cdf, rng.random((n_docs, 8)))
    texts = [" ".join(r) for r in vocab[np.minimum(ids, len(vocab) - 1)]]
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    sdix = ShardedDeviceIndex(ix, make_mesh(data=4, docs=2))
    qids = np.searchsorted(cdf, cdf[99] + rng.random((window, 3)) * (1 - cdf[99]))
    queries = [" ".join(r) for r in vocab[np.minimum(qids, len(vocab) - 1)]]
    scorer = bm25.new()

    planned, fb = sdix.plan_batch(queries, whitespace_tokenizer, scorer)
    assert planned is not None and not fb
    sdix._pack_window(planned, window)  # warm

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        sdix._pack_window(planned, window)
    per = 1e3 * (time.perf_counter() - t0) / reps
    print(f"pack alone: {per:.2f} ms / {window}-query window ({reps} reps)")

    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        sdix._pack_window(planned, window)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(15)
    print(s.getvalue())


if __name__ == "__main__":
    main()
