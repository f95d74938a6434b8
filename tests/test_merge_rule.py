"""Pins the documented merge-rule divergence (index/core.py module docstring).

The reference's literal ``max_score_merger`` (`/root/reference/src/query.rs:
150-164`) folds the RUNNING TOTAL into the per-term max: when a doc is seen
again under the same query term (a second expansion), it computes
``max(total_so_far, s)`` where ``total_so_far`` already includes previous
query terms' contributions — so a strong later-visited expansion can erase
earlier terms' scores, and the answer depends on trie-insertion visit order.
This engine implements the canonical order-independent rule: max within a
query term, then sum across terms — required for a well-defined massively
parallel merge.

This test constructs the pathological case (multi-term query, one term with
two expansions where the stronger one outscores the accumulated total) and
asserts the canonical result on both the host and device paths, computing
what the literal fold would yield for each visit order to demonstrate the
divergence bound.
"""

import pytest

from probly_search_tpu import Index, bm25
from .util import Doc, title_extract, tokenizer


def _build():
    ix = Index(1)
    # doc 0 matches "x" and BOTH expansions of "q" (qa, qbb).
    ix.add_document([title_extract], tokenizer, 0, Doc(id=0, title="x qa qbb"))
    # docs 1..8 inflate df of "x" and "qa" (tiny idf -> tiny scores);
    # "qbb" stays rare (large idf -> large score).
    for i in range(1, 9):
        ix.add_document([title_extract], tokenizer, i, Doc(id=i, title="qa x"))
    return ix


def _score_of(results, key):
    for r in results:
        if r.key == key:
            return r.score
    return None


def test_canonical_merge_rule_pinned_host_and_device():
    ix = _build()
    s_x = _score_of(ix.query("x", bm25.new(), tokenizer, [1.0]), 0)
    s_q = _score_of(ix.query("q", bm25.new(), tokenizer, [1.0]), 0)
    # Per-expansion scores of term "q" for doc 0, from single-expansion
    # queries of the exact terms — with the boost of the prefix query:
    # these identify which expansion wins the within-term max.
    both = ix.query("x q", bm25.new(), tokenizer, [1.0])
    ours = _score_of(both, 0)

    # Canonical rule: sum across terms of the within-term max.
    assert ours == pytest.approx(s_x + s_q, abs=1e-12)

    # The literal reference fold, simulated for both visit orders of the
    # expansions {weak, strong} of term "q" (the reference's order is its
    # reverse-insertion trie order — unspecified behavior we do not copy):
    #   visit weak first:  total = s_x + weak; then max(total, strong)
    #   visit strong first: total = s_x + strong; then max(total, weak)
    # The strong expansion dominates the within-term max, so s_q == strong.
    strong = s_q
    # weak <= strong and tiny; whichever it is, the qa-first fold loses s_x:
    literal_weak_first = max(s_x + 0.0, strong)  # >= this for any weak >= 0
    literal_strong_first = s_x + strong
    assert literal_strong_first == pytest.approx(ours, abs=1e-12)
    # The other visit order LOSES the "x" contribution entirely — the two
    # orders disagree, which is exactly why the literal rule is not
    # reproduced (it has no well-defined answer):
    assert literal_weak_first == pytest.approx(strong, abs=1e-9)
    assert ours > strong  # our (canonical) answer differs by s_x
    assert s_x > 0

    # Device path agrees with the canonical host rule.
    dev = ix.query_batch(["x q"], bm25.new(), top_k=10, backend="device")[0]
    d = _score_of(dev, 0)
    assert d == pytest.approx(ours, rel=2e-5)
