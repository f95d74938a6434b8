#!/usr/bin/env python
"""Bisect probe: which fused-z2o kernel shape crashes the remote Mosaic
compile helper (r5 session 2: HTTP 500, tpu_compile_helper exit 1)?

Runs fused_z2o_topk directly at a ladder of tiny shapes in ONE process,
printing the FULL error for the first failure of each flavor.  Shapes use
synthetic but contract-valid chunk tables (doc-ascending runs, 128-aligned
starts, R=4 rows: doc, tf[f], flen_bits[f], alive).
"""

import sys
import time
import traceback

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_case(B, NC, C, F, k):
    # Mirror the serving rec layout (index/device.py): Mosaic's DMA
    # row-tiling rule accepts 4 and multiples of 8, rejects 6 and 12
    # ("Slice shape along dimension 0 must be aligned to tiling (8)").
    R = 4 if (2 + 2 * F) <= 4 else -(-(2 + 2 * F) // 8) * 8
    # rec: one long posting array with alternating 128-aligned runs.
    P = NC * B * C + 256
    rng = np.random.default_rng(0)
    rec = np.zeros((R, P), dtype=np.int32)
    docs = np.sort(rng.integers(0, 1 << 20, size=P)).astype(np.int32)
    rec[0] = docs
    for f in range(F):
        rec[1 + f] = rng.integers(1, 5, size=P)
        rec[1 + F + f] = rng.random(P, dtype=np.float32).view(np.int32)
    rec[1 + 2 * F] = 1
    c_start = (rng.integers(0, (P - C) // 128, size=(B, NC)) * 128).astype(
        np.int32
    )
    c_skip = np.zeros((B, NC), dtype=np.int32)
    c_len = np.full((B, NC), C, dtype=np.int32)
    c_qterm = rng.integers(0, 4, size=(B, NC)).astype(np.int32)
    c_score = rng.random((B, NC), dtype=np.float32)
    c_rank = rng.integers(0, 8, size=(B, NC)).astype(np.int32)
    qlen = np.full(B, 2.0, dtype=np.float32)
    return rec, c_start, c_skip, c_len, c_qterm, c_score, c_rank, qlen


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from probly_search_tpu.ops.pallas_z2o import fused_z2o_topk

    ladder = [
        ("tiny F=1", dict(B=8, NC=2, C=1024, F=1, k=10)),
        ("tiny F=2", dict(B=8, NC=2, C=1024, F=2, k=10)),
        ("L=4096 F=2", dict(B=8, NC=4, C=1024, F=2, k=10)),
        ("L=8192 F=2", dict(B=8, NC=8, C=1024, F=2, k=10)),
        ("F=4 (R=12 rec)", dict(B=8, NC=2, C=1024, F=4, k=10)),
        ("serving B=512 L=2048 F=2", dict(B=512, NC=2, C=1024, F=2, k=10)),
    ]
    for name, p in ladder:
        B, NC, C, F, k = p["B"], p["NC"], p["C"], p["F"], p["k"]
        args = make_case(B, NC, C, F, k)
        t0 = time.time()
        try:
            s, d = fused_z2o_topk(
                *[np.asarray(a) for a in args], chunk=C, k=k, num_fields=F
            )
            s = np.asarray(s)
            log(f"OK   {name}: compiled+ran in {time.time() - t0:.1f}s "
                f"(top score {float(s[0, 0]):.3f})")
        except Exception:
            log(f"FAIL {name} after {time.time() - t0:.1f}s:")
            traceback.print_exc(file=sys.stderr)
            log("=" * 72)


if __name__ == "__main__":
    main()
