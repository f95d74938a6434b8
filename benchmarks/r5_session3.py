#!/usr/bin/env python
"""Round-3 TPU session 3: zero-to-one fused-vs-staged A/B.

Session 2 found the fused kernel's remote-compile blockers (pure-broadcast
reshape; rec row tiling); benchmarks/probe_fused_z2o.py now passes its whole
shape ladder on the real toolchain.  This session answers VERDICT item 2:
does the VMEM-resident kernel beat the staged XLA fast program at the
50k/2-field serving bench (target >= 80k QPS), and is it oracle-exact?

Interleaved A/B inside one process (tunnel weather swings +-20% minute to
minute); staged warms FIRST so a wedged fused compile still leaves numbers.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")
    from concurrent.futures import ThreadPoolExecutor

    from probly_search_tpu import Index, whitespace_tokenizer, zero_to_one
    from probly_search_tpu.ops.z2o_device import z2o_query_batch_async
    import probly_search_tpu.index.device as _dev

    out = {}
    depth = 3

    rng = np.random.default_rng(7)
    zv = np.array(["w%04d" % i for i in range(4000)])
    zw = 1.0 / np.arange(1, len(zv) + 1) ** 1.05
    zcdf = np.cumsum(zw)
    zcdf /= zcdf[-1]

    def ztexts(n, length):
        ids = np.searchsorted(zcdf, rng.random((n, length)))
        return [" ".join(row) for row in zv[np.minimum(ids, len(zv) - 1)]]

    t0 = time.time()
    zix = Index(2)
    zix.add_documents_columnar(
        list(range(50_000)), [ztexts(50_000, 3), ztexts(50_000, 8)]
    )
    n_queries = 2048
    lo = zcdf[49]
    qids = np.searchsorted(zcdf, lo + rng.random((n_queries, 2)) * (1.0 - lo))
    zqueries = [" ".join(row) for row in zv[np.minimum(qids, len(zv) - 1)]]
    zdix = zix.device_index()
    log(f"z2o corpus built ({time.time() - t0:.0f}s)")

    def z2o_warm(mode):
        _dev._FUSED_MODE = mode
        tw = time.time()
        for s in range(0, n_queries, 512):
            z2o_query_batch_async(
                zdix, zqueries[s : s + 512], whitespace_tokenizer, 10
            ).get_arrays()
            log(f"z2o[{mode}] warm {s + 512} ({time.time() - tw:.0f}s)")
        z2o_query_batch_async(zdix, zqueries, whitespace_tokenizer, 10).get_arrays()
        log(f"z2o[{mode}] warm full ({time.time() - tw:.0f}s)")

    def z2o_section():
        t1 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=1) as pool:
            futs = []
            for _ in range(6):
                h = z2o_query_batch_async(zdix, zqueries, whitespace_tokenizer, 10)
                futs.append(pool.submit(h.get_arrays))
                if len(futs) >= depth:
                    futs.pop(0).result()
            for f in futs:
                f.result()
        return 6 * n_queries / (time.perf_counter() - t1)

    z2o_modes = ["off"]
    z2o_warm("off")
    try:
        t_probe = time.time()
        z2o_warm("auto")
        out["z2o_fused_compile_s"] = round(time.time() - t_probe, 1)
        z2o_modes.append("auto")
    except Exception as e:
        log(f"z2o fused warm FAILED: {e!r:.600s}")
        out["z2o_fused_error"] = repr(e)[:300]

    zres = {m: [] for m in z2o_modes}
    for rep in range(5):
        for mode in z2o_modes:
            _dev._FUSED_MODE = mode
            q = z2o_section()
            zres[mode].append(q)
            log(f"z2o rep {rep} mode={mode}: {q:.0f} QPS")
    for mode in z2o_modes:
        med = sorted(zres[mode])[len(zres[mode]) // 2]
        log(f"z2o mode={mode}: {[f'{q:.0f}' for q in zres[mode]]} median {med:.0f}")
        out[f"z2o_qps_{mode}"] = round(med, 1)
        out[f"z2o_qps_{mode}_reps"] = [round(q) for q in zres[mode]]
    best_mode = max(z2o_modes, key=lambda m: sorted(zres[m])[len(zres[m]) // 2])
    out["z2o_best_mode"] = best_mode
    out["z2o_qps"] = out[f"z2o_qps_{best_mode}"]

    # parity vs f64 oracle for BOTH modes
    zsample = zqueries[:24]
    for mode in z2o_modes:
        _dev._FUSED_MODE = mode
        rows = zix.query_batch(zsample, zero_to_one.new(), top_k=10, backend="device")
        worst = 0.0
        for q, row in zip(zsample, rows):
            oracle = zix.query(
                q, zero_to_one.new(), whitespace_tokenizer, [1.0, 1.0], top_k=10
            )
            assert len(row) == len(oracle), (mode, q)
            assert [r.key for r in row] == [r.key for r in oracle], (mode, q)
            a = [r.score for r in row]
            b = [r.score for r in oracle]
            worst = max(
                worst,
                max((abs(x - y) / max(1e-9, abs(y)) for x, y in zip(a, b)), default=0.0),
            )
        log(f"z2o parity mode={mode}: worst rel err {worst:.2e}, rankings equal")
        assert worst < 1e-4, (mode, worst)
        out[f"z2o_worst_rel_err_{mode}"] = worst
    _dev._FUSED_MODE = "auto"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
