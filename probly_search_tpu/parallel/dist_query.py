"""Doc-sharded distributed query execution over a ("data", "docs") mesh.

Layout: doc slot ``g`` lives on shard ``g % n_shards`` with local slot
``g // n_shards``; each shard holds the CSR postings of its docs for ALL
terms (classic partition-by-document).  One global sorted term dictionary is
shared; per-shard CSR offsets index each shard's posting record array.

Collective plan (ICI):
  * job tables broadcast (tiny; sharded over "data", replicated over "docs")
  * per-group df partials -> ``psum`` over "docs" (idf must be global — the
    distributed analogue of count_documents, index.rs:282-297)
  * per-shard local top-k -> ``all_gather`` over "docs" -> final top-k
    (replicated).  Only O(k) values cross the interconnect per query.

The per-shard compute is the SAME ``_query_step_impl`` as the single-chip
path (index/device.py) with ``df_reduce`` plugged in — one engine, one
semantics, N chips.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..index.device import (
    _MAX_CHAR,
    _LEN_BITS,
    _MAX_GROUPS,
    _MAX_JOB_LEN,
    _QT_BITS,
    _bucket,
    _segment_arange,
)
from ..index.segment import merge_segments
from ..models.base import QueryResult
from ..utils.tokenizers import whitespace_tokenizer


class ShardedDeviceIndex:
    """Doc-sharded device snapshot of an Index over a mesh."""

    CHUNK = 512
    NC_BUCKETS = (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048)
    NJ_BUCKETS = (4, 8, 16, 32, 64, 128, 256)

    def __init__(self, index, mesh) -> None:
        index._flush_pending()
        self.version = index.version
        self._index = index
        self.config = index.config
        self.mesh = mesh
        n = int(mesh.shape["docs"])
        self.n_shards = n
        F = index.num_fields
        self.num_fields = F
        C = self.CHUNK

        # One global merged segment (keeps latently-deleted postings, like
        # the single-chip snapshot).
        gseg = merge_segments(index._segments, F)
        T = gseg.num_terms
        self.terms = np.asarray(gseg.terms, dtype=np.str_)
        self.term_lens = gseg.term_lens.astype(np.int64)

        S = index._next_slot
        alive = index._alive[:S]
        doc_len = index._doc_len[:S].astype(np.float32) if S else np.zeros((0, F), np.float32)

        # Per-shard CSR: select postings by doc % n (order within a term is
        # preserved, so per-shard postings stay doc-sorted).
        R = -(-(1 + 2 * F) // 4) * 4  # sublane-aligned (see index/device.py)
        post_doc = gseg.post_doc
        term_of_post = np.repeat(
            np.arange(T, dtype=np.int64), np.diff(gseg.offsets).astype(np.int64)
        )
        shard_of = post_doc % n if len(post_doc) else post_doc
        offsets_sh = np.zeros((n, T + 1), dtype=np.int64)
        recs = []
        pmax = 0
        shard_rows = []
        for s in range(n):
            sel = np.flatnonzero(shard_of == s)
            counts = np.bincount(term_of_post[sel], minlength=T)
            np.cumsum(counts, out=offsets_sh[s, 1:])
            shard_rows.append(sel)
            pmax = max(pmax, len(sel))
        self.offsets_sh = offsets_sh
        # Transposed per-shard record arrays [n, R, Pmax + C] (see
        # index/device.py layout note).
        rec = np.zeros((n, R, pmax + C), dtype=np.int32)
        rec[:, 0] = -1
        for s in range(n):
            sel = shard_rows[s]
            m = len(sel)
            if m:
                gdoc = post_doc[sel]
                local = gdoc // n
                rec[s, 0, :m] = np.where(alive[gdoc], local, -1)
                rec[s, 1 : 1 + F, :m] = gseg.post_tf[sel].T
                rec[s, 1 + F : 1 + 2 * F, :m] = doc_len[gdoc].view(np.int32).T

        # Place shard-major arrays on the mesh: sharded over "docs",
        # replicated over "data".
        self.rec = jax.device_put(rec, NamedSharding(mesh, P("docs", None, None)))
        self.field_avg = jax.device_put(
            np.array([fd.avg for fd in index._fields], dtype=np.float32),
            NamedSharding(mesh, P()),
        )
        self.n_docs = float(len(index._docs))
        self.slot_to_key = list(index._slot_to_key)
        self._qterm_bits = _QT_BITS
        self._step_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ #
    # planning                                                            #
    # ------------------------------------------------------------------ #

    def plan_batch(self, queries: Sequence[str], tokenizer):
        """Plan into term-id-level jobs; shard-specific ranges resolved per
        shard from ``offsets_sh``.  Returns (jquery, words[n, NJOBS, 3],
        nchunks_max[B], njobs[B]) or None."""
        cfg = self.config
        B = len(queries)
        n = self.n_shards
        C = self.CHUNK

        tok_lists = [[t for t in tokenizer(q) if t] for q in queries]
        for toks in tok_lists:
            if len(toks) > cfg.max_query_terms:
                raise ValueError(
                    f"query has {len(toks)} terms > max_query_terms="
                    f"{cfg.max_query_terms}"
                )
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        total_terms = int(counts.sum())
        if total_terms == 0 or len(self.terms) == 0:
            return None
        flat_query = np.repeat(np.arange(B, dtype=np.int64), counts)
        flat_qterm = _segment_arange(counts)
        flat_terms = np.asarray([t for toks in tok_lists for t in toks], dtype=np.str_)
        flat_blen = np.char.str_len(np.char.encode(flat_terms, "utf-8")).astype(np.int64)

        lo = np.searchsorted(self.terms, flat_terms, side="left")
        hi = np.searchsorted(self.terms, np.char.add(flat_terms, _MAX_CHAR), side="left")
        nexp = hi - lo
        if nexp.max(initial=0) == 0:
            return None
        if nexp.max(initial=0) > cfg.max_expansions:
            raise ValueError("expansion cap exceeded; raise max_expansions")
        tid = np.repeat(lo, nexp) + _segment_arange(nexp)
        jidx = np.repeat(np.arange(total_terms, dtype=np.int64), nexp)
        jquery = flat_query[jidx]

        # One global dict -> df group id is the job's position within its
        # query (jobs are query-sorted; zero-job queries contribute empty
        # runs).
        njobs = np.bincount(jquery, minlength=B)
        group_local = _segment_arange(njobs)
        if group_local.max(initial=0) > _MAX_GROUPS:
            raise ValueError("too many df groups per query")

        exact = self.terms[tid] == flat_terms[jidx]
        boost = np.where(
            exact, 1.0, np.log1p(1.0 / (1.0 + self.term_lens[tid] - flat_blen[jidx]))
        ).astype(np.float32)

        # Per-shard job words (same job order on every shard — required so
        # group ids align for the df psum).
        NJOBS = len(tid)
        words = np.empty((n, NJOBS, 3), dtype=np.int32)
        meta1 = (
            (flat_qterm[jidx] << _LEN_BITS) | (group_local << (_LEN_BITS + _QT_BITS))
        ).astype(np.int64)
        max_chunks = np.zeros(B, dtype=np.int64)
        for s in range(n):
            offs = self.offsets_sh[s]
            start = offs[tid]
            length = offs[tid + 1] - offs[tid]
            if length.max(initial=0) > _MAX_JOB_LEN:
                raise ValueError("per-shard posting list exceeds packed job length")
            words[s, :, 0] = start
            words[s, :, 1] = length | meta1
            words[s, :, 2] = boost.view(np.int32)
            nch = np.bincount(jquery, weights=((length + (C - 128) - 1) // (C - 128)).astype(np.float64), minlength=B)
            np.maximum(max_chunks, nch.astype(np.int64), out=max_chunks)
        return jquery, words, max_chunks, njobs

    # ------------------------------------------------------------------ #
    # execution                                                           #
    # ------------------------------------------------------------------ #

    def _get_sharded_step(self, scorer, nc: int, nj: int, k: int, b_local: int):
        key = (
            getattr(scorer, "device_cache_key", lambda: ("id", id(scorer)))(),
            nc, nj, k, b_local,
        )
        fn = self._step_cache.get(key)
        if fn is not None:
            return fn

        from ..index.device import _query_step_impl

        mesh = self.mesh
        n = self.n_shards
        C = self.CHUNK
        qb = self._qterm_bits

        def per_shard(rec_blk, jobs_blk, field_avg, n_docs, fields_boost):
            rec_l = rec_blk[0]  # [P+C, R]
            jobs_l = jobs_blk[0, 0]  # [B_local, NJ*3]
            scores, docs_local = _query_step_impl(
                scorer,
                chunk=C,
                k=k,
                qterm_bits=qb,
                num_fields=self.num_fields,
                num_chunks=nc,
                rec=rec_l,
                field_avg=field_avg,
                n_docs=n_docs,
                fields_boost=fields_boost,
                jobs_flat=jobs_l,
                df_reduce=lambda df: jax.lax.psum(df, "docs"),
            )
            shard_id = jax.lax.axis_index("docs")
            docs_global = jnp.where(docs_local >= 0, docs_local * n + shard_id, -1)
            # Merge per-shard top-k: all-gather O(k) values, reduce.
            s_all = jax.lax.all_gather(scores, "docs")  # [n, B_local, k]
            d_all = jax.lax.all_gather(docs_global, "docs")
            s_cat = jnp.moveaxis(s_all, 0, 1).reshape(scores.shape[0], n * k)
            d_cat = jnp.moveaxis(d_all, 0, 1).reshape(scores.shape[0], n * k)
            v, i = jax.lax.top_k(s_cat, k)
            d = jnp.take_along_axis(d_cat, i, axis=1)
            d = jnp.where(jnp.isfinite(v), d, -1)
            return v[None, None], d[None, None]  # [1, 1, B_local, k]

        fn = jax.jit(
            jax.shard_map(
                per_shard,
                mesh=mesh,
                in_specs=(
                    P("docs", None, None),
                    P("docs", "data", None, None),
                    P(),
                    P(),
                    P(),
                ),
                out_specs=(P("docs", "data", None, None), P("docs", "data", None, None)),
            )
        )
        self._step_cache[key] = fn
        return fn

    def query_batch(
        self,
        queries: Sequence[str],
        scorer,
        tokenizer=whitespace_tokenizer,
        fields_boost: Optional[Sequence[float]] = None,
        top_k: Optional[int] = None,
    ) -> List[List[QueryResult]]:
        if fields_boost is None:
            fields_boost = [1.0] * self.num_fields
        k = top_k or self.config.default_top_k
        B = len(queries)
        planned = self.plan_batch(queries, tokenizer)
        if planned is None:
            return [[] for _ in queries]
        jquery, words, max_chunks, njobs = planned
        n = self.n_shards
        d_ax = int(self.mesh.shape["data"])
        C = self.CHUNK

        nc = _bucket(int(max_chunks.max(initial=1)), self.NC_BUCKETS, 4)
        nj = _bucket(int(njobs.max(initial=1)), self.NJ_BUCKETS, 4)
        b_local = -(-B // d_ax)
        b_local = max(1, b_local)

        jobs = np.zeros((n, d_ax, b_local, nj, 3), dtype=np.int32)
        # Scatter job words: query q -> (data row q // b_local, slot q % b_local).
        pos = _segment_arange(np.bincount(jquery, minlength=B))
        drow = jquery // b_local
        dslot = jquery % b_local
        jobs[:, drow, dslot, pos] = words
        jobs_flat = jobs.reshape(n, d_ax, b_local, nj * 3)

        step = self._get_sharded_step(scorer, nc, nj, k, b_local)
        jobs_dev = jax.device_put(
            jobs_flat, NamedSharding(self.mesh, P("docs", "data", None, None))
        )
        v, d = step(
            self.rec,
            jobs_dev,
            self.field_avg,
            jnp.float32(self.n_docs),
            jnp.asarray(np.asarray(fields_boost, dtype=np.float32)),
        )
        v = np.asarray(v)[0]  # [data, b_local, k] (replicated over docs)
        d = np.asarray(d)[0]
        out: List[List[QueryResult]] = []
        for q in range(B):
            vr = v[q // b_local, q % b_local]
            dr = d[q // b_local, q % b_local]
            out.append(
                [
                    QueryResult(key=self.slot_to_key[int(g)], score=float(s))
                    for s, g in zip(vr, dr)
                    if g >= 0 and np.isfinite(s)
                ]
            )
        return out
