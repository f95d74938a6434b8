#!/usr/bin/env python
"""Isolate per-kernel launch overhead: N trivial Pallas calls vs N trivial
XLA ops inside ONE jit, and the full window program with the fused kernels
disabled (staged XLA everywhere).  Diagnostics only."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_corpus, make_queries, log  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    log(f"devices: {jax.devices()}")

    def tiny_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def pallas_add(x):
        return pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((8, 512), jnp.float32)
    for n_calls in (1, 4, 16):
        for name, op in (("pallas", pallas_add), ("xla", lambda a: a + 1.0)):

            @functools.partial(jax.jit, static_argnames=())
            def chain(a, op=op, n=n_calls):
                for _ in range(n):
                    a = op(a)
                return a

            np.asarray(chain(x))  # compile
            t0 = time.perf_counter()
            for _ in range(3):
                out = chain(x)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / 3
            log(f"  chain of {n_calls:3d} {name:6s} calls: {1e3 * dt:7.1f}ms/run")

    # --- full window, fused vs staged ------------------------------------ #
    from probly_search_tpu import Index, bm25
    import probly_search_tpu.index.device as dev

    n_docs = int(1e6)
    vocab, cdf, texts = make_corpus(n_docs, 50_000, 8)
    queries = make_queries(vocab, cdf, 8192, 3)
    ix = Index(1)
    ix.add_documents_columnar(list(range(n_docs)), [texts])
    scorer = bm25.new()
    dix = ix.device_index()
    for mode in ("auto", "off"):
        dev._FUSED_MODE = mode
        dev._STEP_CACHE.clear()
        t0 = time.perf_counter()
        dix.query_batch(queries, scorer, top_k=10)
        compile_t = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            dix.query_batch(queries, scorer, top_k=10)
            times.append(time.perf_counter() - t0)
        log(
            f"window W=8192 fused={mode}: min {1e3 * min(times):.0f}ms avg "
            f"{1e3 * sum(times) / 3:.0f}ms -> {8192 / min(times):.0f} QPS "
            f"(compile {compile_t:.0f}s)"
        )
    dev._FUSED_MODE = "auto"


if __name__ == "__main__":
    main()
