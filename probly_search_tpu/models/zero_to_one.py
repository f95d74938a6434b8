"""Zero-to-one scorer — normalized [0, 1] title/label matching.

Reproduces `/root/reference/src/score/default/zero_to_one.rs` exactly.
Design goals from the reference header (zero_to_one.rs:1-9): penalize
repeated query terms; do not penalize repeated document terms; a perfect
score of 1 requires the query term count ~= the document term count and
matching term lengths.

This scorer is **stateful and two-phase**:

* ``score`` (zero_to_one.rs:44-82) does no scoring — it records a
  ``ScoreByTerm`` tuple per (document, field) with tf > 0 and returns a
  provisional ``0.0`` so the document lands in the result map.
  The recorded entry score is ``1 - |len(expanded) - len(term)| / len(expanded)``
  with *byte* lengths (Rust ``str::len()``).
* ``finalize`` (zero_to_one.rs:84-126) computes the real scores: per
  document, per field, sort the entries by score descending (stable) and
  consume them sequentially —

  - skip an entry whose ``query_term_index`` was already consumed,
  - maintain a "df pool" per index node, initialized lazily to
    ``term_frequency - 1`` on first touch and decremented on reuse; an
    exhausted pool skips the entry,
  - accumulate ``min(score/tf, 1) * tf / max(field_length, query_terms_len)``.

  The document score is the max over fields of the pool sums (and the
  provisional score).  State is cleared after each query.

Ordering note: entries are recorded in visit order.  The reference visits
expansions in trie DFS reverse-insertion order; this engine visits them in
lexicographic term order.  Equal-score ties in the stable sort can therefore
consume in a different order than the reference in pathological corpora; all
reference golden tests (zero_to_one.rs:129-405) pass identically — this
engine's ordering is deterministic (query term index asc, expansion
lexicographic asc, document slot asc).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional

from .base import (
    BaseScoreCalculator,
    DocumentDetails,
    DocumentPointer,
    FieldData,
    QueryResult,
    TermData,
)


@dataclass
class ScoreByTerm:
    """One recorded (document, field, query-term, expansion) tuple
    (zero_to_one.rs:27-34)."""

    query_term_index: int
    all_query_terms_len: int
    field_length: int
    index_node_id: int
    term_frequency: int
    score: float


class ZeroToOne(BaseScoreCalculator):
    """Stateful zero-to-one scorer (zero_to_one.rs:24-127)."""

    device_needs_finalize = True

    def __init__(self):
        # key -> per-field list of ScoreByTerm (zero_to_one.rs:25).
        self.score_by_document_and_field: Dict[Any, List[List[ScoreByTerm]]] = {}

    def score(
        self,
        before_output: Optional[Any],
        document_pointer: DocumentPointer,
        document_details: DocumentDetails,
        index_node: int,
        field_data: FieldData,
        term_expansion: TermData,
    ) -> Optional[float]:
        key = document_details.key
        num_fields = len(document_details.field_length)
        for x in range(num_fields):
            tf = int(document_pointer.term_frequency[x])
            if tf > 0:
                # Byte lengths, like Rust str::len() (zero_to_one.rs:57-58).
                term_exp_len = float(len(term_expansion.query_term_expanded.encode("utf-8")))
                term_len = float(len(term_expansion.query_term.encode("utf-8")))
                field_length = int(document_details.field_length[x])
                if key not in self.score_by_document_and_field:
                    self.score_by_document_and_field[key] = [[] for _ in range(num_fields)]
                self.score_by_document_and_field[key][x].append(
                    ScoreByTerm(
                        score=1.0 - abs(term_exp_len - term_len) / term_exp_len,
                        all_query_terms_len=term_expansion.query_terms_len,
                        query_term_index=term_expansion.query_term_index,
                        index_node_id=index_node,
                        term_frequency=tf,
                        field_length=field_length,
                    )
                )
        return 0.0  # dummy; real score computed in finalize (zero_to_one.rs:81)

    def finalize(self, results: List[QueryResult]) -> None:
        for result in results:
            for field_scores in self.score_by_document_and_field[result.key]:
                df_pool_by_id: Dict[int, int] = {}
                consumed_index = set()
                # Stable sort by score desc (zero_to_one.rs:98).
                field_scores.sort(key=lambda s: -s.score)
                score_by_pool = 0.0
                for s in field_scores:
                    if s.query_term_index in consumed_index:
                        continue
                    if s.index_node_id in df_pool_by_id:
                        if df_pool_by_id[s.index_node_id] <= 0:
                            # Pool consumed: no more points from this node
                            # (zero_to_one.rs:104-109).
                            continue
                        df_pool_by_id[s.index_node_id] -= 1
                    else:
                        df_pool_by_id[s.index_node_id] = s.term_frequency - 1
                    consumed_index.add(s.query_term_index)
                    df = float(s.term_frequency)
                    score_by_pool += (
                        min(s.score / df, 1.0)
                        * s.term_frequency
                        / max(s.field_length, s.all_query_terms_len)
                    )
                result.score = max(score_by_pool, result.score)
        # Clear statistics for reuse across queries (zero_to_one.rs:125).
        self.score_by_document_and_field = {}


def new() -> ZeroToOne:
    """Factory matching ``score::zero_to_one::new()`` (zero_to_one.rs:35)."""
    return ZeroToOne()
