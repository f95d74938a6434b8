"""Okapi BM25 scorer.

Reproduces `/root/reference/src/score/default/bm25.rs` exactly (the golden
tests in that file and in `src/query.rs:166-389` are the spec):

* Defaults ``k1 = 1.2``, ``b = 0.75`` (bm25.rs:21-26).
* **df clamping** (bm25.rs:41): ``frequency = min(N_docs, df)`` then
  ``diff = N_docs - frequency``.  Required because the reference stores one
  posting per term *occurrence* (index.rs:119), so df can exceed the number
  of live documents; this engine stores de-duplicated postings but defines
  df identically as the number of live posting pointers = sum over live docs
  of total term occurrences across all fields (see index/core.py), so the
  clamp fires in the same situations and the numerics match bit-for-bit.
* **IDF** (bm25.rs:56): ``ln(1 + (diff + 0.5) / (frequency + 0.5))`` — the
  Lucene-style non-negative variant.
* **Expansion boost** (bm25.rs:44-55): exact match -> 1.0, otherwise
  ``ln(1 + 1 / (1 + len(expanded) - len(term)))`` with *byte* lengths
  (Rust ``str::len()`` counts bytes, not chars).
* **Per-posting score** (bm25.rs:71-92): for each field with tf > 0,
  ``tf_norm = ((k1+1)*tf) / (k1*((1-b) + b*(field_len/avg_field_len)) + tf)``
  and ``score += tf_norm * idf * boost[field] * expansion_boost``; returns
  ``None`` when the total is not > 0 so zero scores never enter the result
  map.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Mapping, Optional

from .base import (
    BaseScoreCalculator,
    DocumentDetails,
    DocumentPointer,
    FieldData,
    TermData,
)


@dataclass
class BM25TermCalculations:
    """`before_each` output (bm25.rs:27-33)."""

    idf: float
    expansion_boost: float


class BM25(BaseScoreCalculator):
    """Okapi BM25 (bm25.rs:14-94).  Stateless; also runs on-device."""

    device_needs_finalize = False
    # score() returns None for non-positive totals (bm25.rs:89-92); the
    # device path must drop those lanes before the merge.
    device_excludes_nonpositive = True

    def __init__(self, bm25k1: float = 1.2, bm25b: float = 0.75):
        self.bm25k1 = bm25k1
        self.bm25b = bm25b

    def device_cache_key(self):
        """Jit-cache key: scorers with equal params share compiled programs."""
        return ("bm25", self.bm25k1, self.bm25b)

    # --- host (exact f64) path --------------------------------------------

    def before_each(
        self,
        term_expansion: TermData,
        document_frequency: int,
        documents: Mapping[Any, DocumentDetails],
    ) -> Optional[BM25TermCalculations]:
        n_docs = len(documents)
        frequency = min(n_docs, document_frequency)  # bm25.rs:41
        diff = n_docs - frequency
        if term_expansion.query_term_expanded == term_expansion.query_term:
            expansion_boost = 1.0
        else:
            # Byte lengths, exactly like Rust str::len() (bm25.rs:51-52).
            len_expanded = len(term_expansion.query_term_expanded.encode("utf-8"))
            len_term = len(term_expansion.query_term.encode("utf-8"))
            # Literal ln(1 + x) like the reference (bm25.rs:48-54), not log1p.
            expansion_boost = math.log(1.0 + (1.0 / (1.0 + len_expanded - len_term)))
        idf = math.log(1.0 + (diff + 0.5) / (frequency + 0.5))  # bm25.rs:56
        return BM25TermCalculations(idf=idf, expansion_boost=expansion_boost)

    def score(
        self,
        before_output: Optional[BM25TermCalculations],
        document_pointer: DocumentPointer,
        document_details: DocumentDetails,
        index_node: int,
        field_data: FieldData,
        term_expansion: TermData,
    ) -> Optional[float]:
        pre = before_output  # always present for BM25 (bm25.rs:69)
        score = 0.0
        k1 = self.bm25k1
        b = self.bm25b
        for x in range(len(document_details.field_length)):
            tf = float(document_pointer.term_frequency[x])
            if tf > 0.0:
                field_length = float(document_details.field_length[x])
                avg_field_length = field_data.fields[x].avg
                tf_norm = ((k1 + 1.0) * tf) / (
                    k1 * ((1.0 - b) + b * (field_length / avg_field_length)) + tf
                )
                score += tf_norm * pre.idf * field_data.fields_boost[x] * pre.expansion_boost
        if score > 0.0:
            return score
        return None  # bm25.rs:89-92

    # --- device (vectorized f32) path --------------------------------------

    def device_term_scale(self, df, n_docs, expansion_boost):
        """Vectorized ``before_each`` over the planned job table (host f64):
        df-clamped Lucene idf (bm25.rs:41-56) times the expansion boost,
        premultiplied into one per-job scale."""
        import numpy as np

        freq = np.minimum(n_docs, df.astype(np.float64))  # bm25.rs:41
        idf = np.log(1.0 + (n_docs - freq + 0.5) / (freq + 0.5))  # bm25.rs:56
        return (idf * expansion_boost).astype(np.float32)

    def device_score_lanes(self, lanes):
        """Vectorized per-lane score (see index/device.py ScoreLanes layout:
        [B, NC, F, C] with the posting lane dim C minor).

        Computes, for every lane (= one posting of one expansion job):
            sum_f tf_norm(tf_f, len_f, avg_f) * boost_f * scale
        where scale = idf * expansion_boost was precomputed on host by
        ``device_term_scale`` (df and n_docs are static per snapshot).
        Math is identical to the host path modulo f32.  Returns
        f32[B, NC, C].
        """
        import jax.numpy as jnp

        k1 = jnp.asarray(self.bm25k1, lanes.tf.dtype)
        b = jnp.asarray(self.bm25b, lanes.tf.dtype)
        tf = lanes.tf  # [B, NC, F, C]
        avg = lanes.field_avg[:, None]  # [F, 1]
        denom = k1 * ((1.0 - b) + b * (lanes.field_length / avg)) + tf
        tf_norm = jnp.where(tf > 0, ((k1 + 1.0) * tf) / denom, 0.0)
        per_field = tf_norm * lanes.fields_boost[:, None]  # [B, NC, F, C]
        base = jnp.sum(per_field, axis=-2)  # [B, NC, C]
        return base * lanes.scale[..., None]


def new(bm25k1: float = 1.2, bm25b: float = 0.75) -> BM25:
    """Factory matching the reference's ``score::bm25::new()`` (bm25.rs:21)."""
    return BM25(bm25k1=bm25k1, bm25b=bm25b)
