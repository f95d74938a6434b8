#!/usr/bin/env python
"""Isolate H2D transfer cost from the new-process tax (build-probe follow-up).

r7_build_probe2.py measured 1101 s for (device_put 64 MB + first d2h) in a
fresh process; that number conflates the per-process first-contact tax
(~100-250 s historically) with the actual bulk-transfer cost.  This probe
pays the tax on a 4-byte array first, then times 64 MB H2D separately —
the split decides whether a device-side CSR pack could ever beat the
~3.5 s native host build end-to-end on this tunneled platform.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    t0 = time.time()
    tiny = jax.device_put(np.zeros(1, np.int32))
    np.asarray(tiny)
    t_tax = time.time() - t0
    log(f"process tax (4-byte round trip): {t_tax:.1f}s")

    rng = np.random.default_rng(0)
    big = rng.integers(0, 50_000, size=8_000_000, dtype=np.int32)
    big2 = rng.integers(0, 1_000_000, size=8_000_000, dtype=np.int32)
    reps = []
    for i in range(3):
        t0 = time.time()
        a = jax.device_put(big)
        b = jax.device_put(big2)
        np.asarray(a[-1:])
        np.asarray(b[-1:])
        reps.append(time.time() - t0)
        log(f"rep{i}: 64 MB H2D + sync: {reps[-1]:.2f}s")
    print(
        json.dumps(
            {
                "metric": "h2d_64mb_probe",
                "process_tax_s": round(t_tax, 1),
                "h2d_64mb_median_s": round(sorted(reps)[1], 2),
                "h2d_64mb_reps_s": [round(r, 2) for r in reps],
            }
        )
    )


if __name__ == "__main__":
    main()
