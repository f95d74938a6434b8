#!/usr/bin/env python
"""Round-3 TPU session 8: decompose the serving window — device vs tunnel.

Session 7 showed query/fetch (~88 ms) is sync+transfer: it includes the
wait for device execution behind the pipeline, so fetched-byte cuts barely
move it.  This session separates the two without trace parsing:

  A. device-ms/window: submit N identical windows back-to-back (executions
     serialize on device), then force ONE sync — elapsed ~= N*device + sync.
  B. pure fetch: re-fetch buffers whose execution is long finished —
     RTT + transfer only, per result format.
  C. overlap: does a D2H fetch of a finished buffer proceed while the
     device executes another window?

Decides the next lever: device compute (lane padding / kernel) vs tunnel
(RTT amortization; bytes are already at the entropy floor).
"""

import json
import statistics
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
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    from probly_search_tpu import Index, IndexConfig, bm25

    out = {}
    window = 16384
    top_k = 10

    t0 = time.time()
    vocab, cdf, texts = bench.make_corpus(int(1e6), 50_000, 8)
    ix = Index(1, config=IndexConfig(result_format="slots20"))
    ix.add_documents_columnar(list(range(int(1e6))), [texts])
    queries = bench.make_queries(vocab, cdf, window * 2, 3)
    windows = [queries[i : i + window] for i in range(0, len(queries), window)]
    scorer = bm25.new()
    dix = ix.device_index()
    log(f"index built ({time.time() - t0:.0f}s)")

    # Warm (programs are cached from sessions 6/7).
    for w in windows:
        dix.query_batch_async(w, scorer, top_k=top_k).get_arrays()
    log("warm done")

    # --- A: device-ms/window -------------------------------------------
    # Submit N windows without fetching; one final fetch syncs the queue.
    # Submission is async (~1 ms each), executions serialize, so
    # elapsed ~= submit_overhead + N*device + sync_fetch.
    for N in (4, 8):
        reps = []
        for _ in range(3):
            t1 = time.perf_counter()
            hs = [
                dix.query_batch_async(windows[i % 2], scorer, top_k=top_k)
                for i in range(N)
            ]
            t_submit = time.perf_counter() - t1
            np.asarray(hs[-1]._packed)  # sync: all N executions done
            elapsed = time.perf_counter() - t1
            # pure fetch of an already-finished buffer (hs[0] long done)
            t2 = time.perf_counter()
            np.asarray(hs[0]._packed)
            pure_fetch = time.perf_counter() - t2
            reps.append((elapsed, t_submit, pure_fetch))
        elapsed = statistics.median(r[0] for r in reps)
        t_submit = statistics.median(r[1] for r in reps)
        pure_fetch = statistics.median(r[2] for r in reps)
        device_ms = 1e3 * (elapsed - pure_fetch) / N
        out[f"queueN{N}_elapsed_ms"] = round(1e3 * elapsed, 1)
        out[f"queueN{N}_submit_ms"] = round(1e3 * t_submit, 1)
        out[f"queueN{N}_pure_fetch_ms"] = round(1e3 * pure_fetch, 1)
        out[f"queueN{N}_device_ms_est"] = round(device_ms, 1)
        log(
            f"N={N}: elapsed {1e3*elapsed:.0f}ms submit {1e3*t_submit:.0f}ms "
            f"pure_fetch {1e3*pure_fetch:.1f}ms -> device ~{device_ms:.1f}ms/window"
        )

    # --- B: pure fetch per format (finished buffers) ---------------------
    # jax.Array caches its host copy after the first __array__, so only
    # FIRST fetches are timed: fresh executions per rep, a sleep guarantees
    # execution finished before the timed fetch (device ~<150 ms/window).
    for fmt in ("slots20", "slots", "compact", "f32"):
        dix.config.result_format = fmt
        ts = []
        for rep in range(4):
            hs = [
                dix.query_batch_async(windows[i], scorer, top_k=top_k)
                for i in (0, 1)
            ]
            time.sleep(1.0)
            for h in hs:
                t1 = time.perf_counter()
                arr = np.asarray(h._packed)
                ts.append(1e3 * (time.perf_counter() - t1))
        med = statistics.median(ts)
        out[f"pure_fetch_ms_{fmt}"] = round(med, 2)
        out[f"fetch_bytes_{fmt}"] = int(arr.nbytes)
        log(f"pure fetch {fmt}: median {med:.1f}ms over {len(ts)} ({arr.nbytes} B)")
    dix.config.result_format = "slots20"

    # --- C: fetch/compute overlap ----------------------------------------
    # Finish window A (sleep, not fetch — fetching would cache the host
    # copy); submit window B; immediately first-fetch A.  If D2H can ride
    # while B executes, fetch(A) ~= pure fetch; if it queues behind B,
    # fetch(A) ~= device + pure fetch.
    ts = []
    for _ in range(5):
        hA = dix.query_batch_async(windows[0], scorer, top_k=top_k)
        time.sleep(1.0)  # A finished, device idle
        hB = dix.query_batch_async(windows[1], scorer, top_k=top_k)
        t1 = time.perf_counter()
        np.asarray(hA._packed)
        ts.append(1e3 * (time.perf_counter() - t1))
        np.asarray(hB._packed)  # drain B before next rep
    med = statistics.median(ts)
    out["fetch_finished_while_executing_ms"] = round(med, 2)
    log(f"fetch(finished A) while B executes: median {med:.1f}ms")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
