#!/usr/bin/env python
"""Host-side lane accounting for the bench window (no device, no index).

Device compute is ~linear in gathered lanes (PERFORMANCE.md r5 session 11,
r6 session 1), so the device-pace ceiling is set by how many lanes a
16384-query window gathers vs the real postings it needs.  This script
reconstructs the exact per-job posting extents of the 1M-doc bench workload
from the corpus generator (term posting length = per-term live doc count;
CSR starts = cumsum over the sorted term table — bit-exact with the real
planner's layout for the single-segment bulk build) and accounts lanes under:

  * the shipping scheme: chunk C=1024, stride-C jobs, fine NC buckets;
  * finer lane quanta Q=512 / Q=256 with a matching geometric NC ladder;
  * per-scheme DMA counts assuming 1024-wide coalescing of contiguous
    same-job units (the planned kernel change) and without.

Output: lanes/window, waste split (tail vs bucket), DMA counts — the
decision input for the r7 kernel work (VERDICT r3 item 2).
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def ladder(qlanes, quanta):
    """Geometric-ish bucket ladder in units, ratio <= 1.25 plus small ints."""
    units = []
    u = 1
    while u * quanta <= 16384:
        units.append(u)
        if u < 8:
            u += 1
        else:
            u = int(np.ceil(u * 1.25))
    arr = np.asarray(units)
    return arr


def account(df, starts, q_tids, C, name, fine_buckets=None):
    """Lanes/DMAs for a window planned at quantum C."""
    # per-job: skip = start % 128; units = ceil((skip + len) / C)
    jl = df[q_tids]  # [W, 3] posting lengths
    js = starts[q_tids]
    skip = js % 128
    units = (skip + jl + C - 1) // C
    q_units = units.sum(axis=1)  # [W]
    if fine_buckets is None:
        buckets = ladder(None, C)
    else:
        buckets = np.asarray(fine_buckets)
    # bucket to the ladder (min 2 like the engine)
    bidx = np.searchsorted(buckets, np.maximum(q_units, 2))
    bidx = np.minimum(bidx, len(buckets) - 1)
    b_units = buckets[bidx]
    lanes = (b_units * C).sum()
    real = jl.sum()
    tail_waste = (units * C - (jl + skip)).sum()
    bucket_waste = ((b_units - q_units) * C).sum()
    # DMA counts: uncoalesced = one per unit; coalesced = per job,
    # ceil(units / (1024 // C)) 1024-wide spans (last may be short).
    dma_raw = units.sum()
    span = max(1024 // C, 1)
    dma_coal = ((units + span - 1) // span).sum()
    print(
        f"{name:>22s}: lanes {lanes/1e6:7.1f}M  real {real/1e6:6.1f}M "
        f"({100.0 * real / lanes:5.1f}% useful)  tail-waste {tail_waste/1e6:6.1f}M "
        f"bucket-waste {bucket_waste/1e6:6.1f}M  DMAs {dma_raw/1e3:6.0f}k"
        f" (coalesced {dma_coal/1e3:6.0f}k)"
    )
    # class histogram (units)
    hist = {}
    for b in b_units:
        hist[int(b)] = hist.get(int(b), 0) + 1
    print(f"{'':>24s}classes: " + " ".join(f"{k}:{v}" for k, v in sorted(hist.items())))
    return lanes


def main():
    n_docs, vocab_size, doc_len = 1_000_000, 50_000, 8
    rng = np.random.default_rng(0)
    weights = 1.0 / np.arange(1, vocab_size + 1) ** 1.07
    cdf = np.cumsum(weights)
    cdf /= cdf[-1]
    ids = np.searchsorted(cdf, rng.random((n_docs, doc_len)))
    ids = np.minimum(ids, vocab_size - 1)
    # posting length per term = number of docs containing it (dedup per doc)
    # Vector version: unique (doc, term) pairs.
    pair = ids + np.arange(n_docs, dtype=np.int64)[:, None] * vocab_size
    uniq = np.unique(pair)
    tid = (uniq % vocab_size).astype(np.int64)
    df = np.bincount(tid, minlength=vocab_size)
    # terms sort lexicographically in the t%05d naming == numeric order
    starts = np.zeros(vocab_size, dtype=np.int64)
    np.cumsum(df[:-1], out=starts[1:])
    print(f"postings total: {df.sum()/1e6:.1f}M")

    # bench queries: 16384 x 3 terms, Zipf with top-100 excluded
    rngq = np.random.default_rng(1)
    lo = cdf[99]
    q = np.searchsorted(cdf, lo + rngq.random((16384, 3)) * (1.0 - lo))
    q = np.minimum(q, vocab_size - 1)

    FINE = (2, 3, 4, 6, 8, 12, 16, 24, 32, 64, 128, 256, 512, 1024,
            2048, 3072, 4096, 6144, 8192, 12288, 16384)
    fine_1024 = [u for u in FINE if u * 1024 <= 16384 * 16]
    account(df, starts, q, 1024, "C=1024 fine (ship)", fine_buckets=fine_1024)
    account(df, starts, q, 512, "Q=512 geo ladder")
    account(df, starts, q, 256, "Q=256 geo ladder")
    account(df, starts, q, 128, "Q=128 geo ladder")


if __name__ == "__main__":
    main()
