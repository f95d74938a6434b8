"""Device-resident index and the batched TPU query path.

The reference answers one query at a time by walking trie nodes and posting
linked lists (`/root/reference/src/query.rs:21-106`).  Here a **query batch**
is the unit of work — the real source of QPS on a TPU — executed as one
static-shaped XLA program:

  host planner (tokenize + binary-search prefix ranges, O(Q log T) per query)
    -> jobs: (start, len, qterm, expansion_boost, df_group) per expansion
  device:
    ranges_to_lanes     — expand jobs into flat posting lanes (ops/lanes.py)
    gather              — doc ids, tf vectors, liveness, field lengths
    df + idf            — segment-sum of live occurrence counts per df-group
                          (the device analogue of count_documents,
                          index.rs:282-297, feeding bm25.rs:41-56)
    scorer.device_score_lanes — fused per-lane scoring (vectorized
                          ScoreCalculator::score, calculator.rs:58-66)
    merge_scores_topk   — sorted segmented max/sum merge + lax.top_k
                          (ops/merge.py; the max_score_merger rule)

Data layout (structure-of-arrays in HBM):
  post_doc  int32[P+1]     — posting doc slots (last row = dummy padding)
  post_tf   int32[P+1, F]  — per-field term frequency
  alive     bool[S+1]      — doc-slot liveness (latent deletion mask)
  doc_len   f32[S+1, F]    — per-doc field lengths (DocumentDetails)
  field_avg f32[F]         — average field lengths (FieldDetails.avg)

The term dictionary stays on the host (strings never cross to device); only
(start, len) ranges do.  A query term's expansions may span several delta
segments; jobs carrying the same expanded term share a **df group** so idf
is computed over the term's full posting set.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.base import QueryResult
from ..utils.tokenizers import whitespace_tokenizer

# jax imported lazily so the host-only path works without it.
import jax
import jax.numpy as jnp

from ..ops.lanes import ranges_to_lanes
from ..ops.merge import INVALID_KEY, merge_scores_topk


@dataclass
class ScoreLanes:
    """Vectorized scoring context — the device analogue of the per-posting
    (DocumentPointer, DocumentDetails, FieldData, TermData) arguments of
    ``ScoreCalculator::score`` (calculator.rs:58-66).  All arrays are
    [..., L] or [..., L, F]."""

    tf: Any  # f32[..., L, F] — per-field term frequency
    field_length: Any  # f32[..., L, F] — per-field doc lengths
    field_avg: Any  # f32[F] — average field lengths
    fields_boost: Any  # f32[F]
    idf: Any  # f32[..., L] — per-lane idf (df-clamped, bm25.rs:41-56)
    expansion_boost: Any  # f32[..., L]
    doc: Any  # int32[..., L] — doc slot
    live: Any  # bool[..., L] — posting is live and in-bounds
    qterm: Any  # int32[..., L] — dense query-term index


def _query_step_impl(
    scorer,
    num_lanes: int,
    k: int,
    qterm_bits: int,
    post_doc,
    post_tf,
    alive,
    doc_len,
    field_avg,
    n_docs,
    fields_boost,
    job_start,
    job_len,
    job_qterm,
    job_boost,
    job_group,
):
    """One batched query step.  [B, J] job arrays -> [B, k] results."""
    B, J = job_start.shape
    dummy_post = post_doc.shape[0] - 1

    expand = jax.vmap(lambda s, l: ranges_to_lanes(s, l, num_lanes, dummy_post))
    lane_post, lane_job, lane_valid = expand(job_start, job_len)  # [B, L]

    doc = post_doc[lane_post]  # [B, L]
    tf = post_tf[lane_post].astype(jnp.float32)  # [B, L, F]
    live = alive[doc] & lane_valid  # [B, L]
    occ = tf.sum(-1)  # [B, L]

    # df per df-group: live posting-pointer count = sum of occurrence counts
    # (the reference's count_documents semantics, index.rs:282-297).
    lane_group = jnp.take_along_axis(job_group, lane_job, axis=1)
    w = jnp.where(live, occ, 0.0)
    df = jax.vmap(lambda ww, gg: jax.ops.segment_sum(ww, gg, num_segments=J))(
        w, lane_group
    )  # [B, J]
    freq = jnp.minimum(n_docs, df)  # bm25.rs:41
    idf = jnp.log(1.0 + (n_docs - freq + 0.5) / (freq + 0.5))  # bm25.rs:56

    lane_idf = jnp.take_along_axis(idf, lane_group, axis=1)
    lane_boost = jnp.take_along_axis(job_boost, lane_job, axis=1)
    lane_qterm = jnp.take_along_axis(job_qterm, lane_job, axis=1)

    lanes = ScoreLanes(
        tf=tf,
        field_length=doc_len[doc],
        field_avg=field_avg,
        fields_boost=fields_boost,
        idf=lane_idf,
        expansion_boost=lane_boost,
        doc=doc,
        live=live,
        qterm=lane_qterm,
    )
    score = scorer.device_score_lanes(lanes)  # [B, L]

    key = jnp.where(live, (doc << qterm_bits) | lane_qterm, INVALID_KEY)
    return merge_scores_topk(key, score, k, qterm_bits)


_STEP_CACHE: Dict[Any, Any] = {}


def _get_step(scorer) -> Any:
    """Jitted step per scorer configuration (compile cache)."""
    key = getattr(scorer, "device_cache_key", None)
    key = key() if callable(key) else ("id", id(scorer))
    fn = _STEP_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            partial(_query_step_impl, scorer),
            static_argnames=("num_lanes", "k", "qterm_bits"),
        )
        _STEP_CACHE[key] = fn
    return fn


def _bucket(n: int, buckets: Sequence[int], minimum: int) -> int:
    n = max(n, minimum)
    for b in buckets:
        if b >= n:
            return b
    # Beyond configured buckets: next power of two (correctness first).
    return 1 << (n - 1).bit_length()


class DeviceIndex:
    """Device-resident snapshot of an Index at a given version."""

    def __init__(self, index) -> None:
        index._flush_pending()
        self.version = index.version
        self._index = index
        self.config = index.config
        F = index.num_fields
        self.num_fields = F
        self.segments = list(index._segments)

        # Concatenate segment postings; host keeps per-segment bases for
        # planning (term dictionaries remain host-side strings).
        self.seg_base: List[int] = []
        doc_parts, tf_parts = [], []
        base = 0
        for seg in self.segments:
            self.seg_base.append(base)
            doc_parts.append(seg.post_doc)
            tf_parts.append(seg.post_tf)
            base += seg.num_postings
        self.num_postings = base

        S = index._next_slot
        self.num_slots = S
        dummy_doc = np.array([S], dtype=np.int32)
        post_doc = np.concatenate(doc_parts + [dummy_doc]) if doc_parts else dummy_doc
        post_tf = np.concatenate(
            tf_parts + [np.zeros((1, F), np.int32)]
        ) if tf_parts else np.zeros((1, F), np.int32)

        alive = np.zeros(S + 1, dtype=bool)
        alive[:S] = index._alive[:S]
        doc_len = np.ones((S + 1, F), dtype=np.float32)
        doc_len[:S] = index._doc_len[:S]

        self.post_doc = jnp.asarray(post_doc)
        self.post_tf = jnp.asarray(post_tf)
        self.alive = jnp.asarray(alive)
        self.doc_len = jnp.asarray(doc_len)
        self.field_avg = jnp.asarray(
            np.array([fd.avg for fd in index._fields], dtype=np.float32)
        )
        self.n_docs = float(len(index._docs))
        self.slot_to_key = list(index._slot_to_key)

        self._qterm_bits = max(1, (max(1, self.config.max_query_terms) - 1).bit_length())
        if S >= (1 << (31 - self._qterm_bits)):
            raise ValueError(
                f"doc slots ({S}) exceed the packed int32 merge-key capacity; "
                f"shard the index over more devices (parallel/) or reduce "
                f"max_query_terms"
            )

    # ------------------------------------------------------------------ #
    # planning (host)                                                     #
    # ------------------------------------------------------------------ #

    def plan(
        self, queries: Sequence[str], tokenizer
    ) -> Optional[Tuple[Dict[str, np.ndarray], int, int]]:
        """Plan a query batch into padded [B, J] job arrays + lane width L."""
        cfg = self.config
        B = len(queries)
        per_query_jobs: List[List[Tuple[int, int, int, float, int]]] = []
        max_jobs = 1
        max_lanes = 1
        for q in queries:
            tokens = list(tokenizer(q))
            jobs: List[Tuple[int, int, int, float, int]] = []
            group_count = 0
            dense_qidx = -1
            for term in tokens:
                if not term:
                    continue
                dense_qidx += 1
                if dense_qidx >= cfg.max_query_terms:
                    raise ValueError(
                        f"query has more than max_query_terms="
                        f"{cfg.max_query_terms} terms; raise the config knob"
                    )
                qlen = len(term.encode("utf-8"))
                # Union of expansions across segments, keyed by term string
                # so split postings share a df group.
                by_term: Dict[str, List[Tuple[int, int]]] = {}
                for si, seg in enumerate(self.segments):
                    lo, hi = seg.prefix_range(term)
                    for tid in range(lo, hi):
                        by_term.setdefault(seg.terms[tid], []).append((si, tid))
                if len(by_term) > cfg.max_expansions:
                    raise ValueError(
                        f"query term {term!r} expands to {len(by_term)} terms "
                        f"(> max_expansions={cfg.max_expansions}); raise the "
                        f"knob or use the exact host path"
                    )
                for exp_term, hits in by_term.items():
                    if exp_term == term:
                        boost = 1.0
                    else:
                        elen = len(exp_term.encode("utf-8"))
                        boost = math.log(1.0 + (1.0 / (1.0 + elen - qlen)))
                    gid = group_count
                    group_count += 1
                    for si, tid in hits:
                        seg = self.segments[si]
                        start = self.seg_base[si] + int(seg.offsets[tid])
                        length = int(seg.offsets[tid + 1] - seg.offsets[tid])
                        if length:
                            jobs.append((start, length, dense_qidx, boost, gid))
            per_query_jobs.append(jobs)
            max_jobs = max(max_jobs, len(jobs))
            max_lanes = max(max_lanes, sum(j[1] for j in jobs))

        J = _bucket(max_jobs, (8, 32, 128, 512, 2048), 8)
        L = _bucket(max_lanes, cfg.lane_buckets, 128)

        job_start = np.zeros((B, J), dtype=np.int32)
        job_len = np.zeros((B, J), dtype=np.int32)
        job_qterm = np.zeros((B, J), dtype=np.int32)
        job_boost = np.zeros((B, J), dtype=np.float32)
        # Padding jobs point at their own (empty) df group.
        job_group = np.tile(np.arange(J, dtype=np.int32), (B, 1))
        for b, jobs in enumerate(per_query_jobs):
            for j, (start, length, qidx, boost, gid) in enumerate(jobs):
                job_start[b, j] = start
                job_len[b, j] = length
                job_qterm[b, j] = qidx
                job_boost[b, j] = boost
                job_group[b, j] = gid
        return (
            dict(
                job_start=job_start,
                job_len=job_len,
                job_qterm=job_qterm,
                job_boost=job_boost,
                job_group=job_group,
            ),
            J,
            L,
        )

    # ------------------------------------------------------------------ #
    # execution                                                           #
    # ------------------------------------------------------------------ #

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
        jobs, J, L = self.plan(queries, tokenizer)
        k_eff = min(k, L)
        step = _get_step(scorer)
        top_scores, top_docs = step(
            post_doc=self.post_doc,
            post_tf=self.post_tf,
            alive=self.alive,
            doc_len=self.doc_len,
            field_avg=self.field_avg,
            n_docs=jnp.float32(self.n_docs),
            fields_boost=jnp.asarray(np.asarray(fields_boost, dtype=np.float32)),
            num_lanes=L,
            k=k_eff,
            qterm_bits=self._qterm_bits,
            **{name: jnp.asarray(arr) for name, arr in jobs.items()},
        )
        return self.to_results(np.asarray(top_scores), np.asarray(top_docs))

    def to_results(self, top_scores: np.ndarray, top_docs: np.ndarray):
        out: List[List[QueryResult]] = []
        for scores_row, docs_row in zip(top_scores, top_docs):
            row = [
                QueryResult(key=self.slot_to_key[int(d)], score=float(s))
                for s, d in zip(scores_row, docs_row)
                if d >= 0 and np.isfinite(s)
            ]
            out.append(row)
        return out
