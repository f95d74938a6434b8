"""r8 session 13: how many gathered lanes on the headline mix are payload?

Host-only (no TPU): plan the full bench query stream against the 1M-doc
corpus and decompose the device lane budget — payload lanes (real
postings), in-chunk tail padding (chunk grid quantization: C=1024 off a
128-aligned base), and class-level pad rows (template headroom; those
are dead-block-skipped in-kernel, so they cost ~nothing).  This bounds
what any further lane-cutting idea could win: device compute is ~linear
in MERGED lanes (PERFORMANCE.md r5 s11), and the merge network width is
nchunks * C regardless of in_pay masking.

Run: python benchmarks/r8s13_lanestats.py 2>&1 | tee /tmp/r8s13.log
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench import make_corpus, make_queries

    from probly_search_tpu import Index, IndexConfig, bm25, whitespace_tokenizer
    from probly_search_tpu.index.device import _MAX_JOB_LEN

    t0 = time.time()
    n_docs = int(1e6)
    window = 16384
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    log(f"build t+{time.time() - t0:.1f}s")
    queries = make_queries(vocab, cdf, window * 2, 3)
    dix = ix.device_index()
    scorer = bm25.new()
    C = dix.CHUNK

    plan, fb = dix.plan_batch(queries, whitespace_tokenizer, scorer)
    assert not fb
    jstart = plan.words[:, 0].astype(np.int64)
    jlen = (plan.words[:, 1] & _MAX_JOB_LEN).astype(np.int64)
    njc = np.where(jlen > 0, (jstart % 128 + jlen + C - 1) // C, 0)
    payload = int(jlen.sum())
    grid = int((njc * C).sum())
    log(
        f"jobs {len(jlen)}  payload lanes {payload}  chunk-grid lanes {grid}"
        f"  in-chunk pad {grid - payload} ({100 * (grid - payload) / grid:.1f}%)"
    )

    # Class-level rows: bucket by per-query chunk count the way the
    # packer does (pow2 / fine buckets), count pad rows and pad chunks.
    nch = plan.nchunks
    log(
        f"per-query chunks: p50 {int(np.median(nch))} "
        f"mean {nch.mean():.1f} p90 {int(np.percentile(nch, 90))} "
        f"max {int(nch.max())}"
    )
    buckets = list(dix.nc_buckets)  # the engine's real class buckets
    bidx = np.searchsorted(np.asarray(buckets), np.maximum(nch, 1))
    bidx = np.minimum(bidx, len(buckets) - 1)
    cls = np.asarray(buckets)[bidx]
    tot_class = int((cls * C).sum())
    log(
        f"class-grid lanes {tot_class}  class pad over grid "
        f"{tot_class - int((nch * C).sum())} "
        f"({100 * (tot_class - int((nch * C).sum())) / tot_class:.1f}% — "
        f"NC bucket rounding; merged but payload-free chunk slots)"
    )
    # The merge network runs at class width: payload / class-width is the
    # ceiling any lane-compaction could reach.
    log(
        f"payload / class-width = {100 * payload / tot_class:.1f}% "
        f"(lane-cut headroom bound: {tot_class / payload:.2f}x fewer lanes "
        f"if padding were free — stages would NOT shrink proportionally)"
    )
    for b in buckets:
        m = cls == b
        if m.any():
            pay = jlen[np.isin(plan.jquery, np.flatnonzero(m))].sum()
            log(
                f"  class NC={b:4d}: {int(m.sum()):6d} queries, "
                f"payload {100 * pay / max(1, (b * C) * m.sum()):.1f}%"
            )


if __name__ == "__main__":
    main()
