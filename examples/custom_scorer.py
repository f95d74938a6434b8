#!/usr/bin/env python
"""Custom scorer — user-pluggable scoring is a headline reference feature
(`/root/reference/README.md:19`, the `ScoreCalculator` trait).  This scorer
implements simple TF-IDF-free "field-weighted term count" with all three
protocol phases, plus the optional device protocol so it runs vectorized on
TPU."""

import os
import sys

sys.path.insert(0, "..")
sys.path.insert(0, ".")

if os.environ.get("PSEARCH_CPU"):  # run on CPU (e.g. while the TPU is busy)
    import jax

    jax.config.update("jax_platforms", "cpu")

from probly_search_tpu import Index, whitespace_tokenizer
from probly_search_tpu.models.base import BaseScoreCalculator


class WeightedCount(BaseScoreCalculator):
    """score(doc) = sum over query terms of max over expansions of
    sum_f tf_f * boost_f; finalize() normalizes by the max score."""

    device_needs_finalize = True  # finalize must run on host

    def score(self, before, pointer, details, node, field_data, term):
        return float(
            sum(
                tf * b
                for tf, b in zip(pointer.term_frequency, field_data.fields_boost)
            )
        )

    def finalize(self, results):
        if results:
            peak = max(r.score for r in results) or 1.0
            for r in results:
                r.score /= peak


index = Index(2)
corpus = [
    (0, "red apple", "fruit sweet red"),
    (1, "green pear", "fruit green"),
    (2, "red car", "vehicle fast red red"),
]
for key, title, body in corpus:
    index.add_document(
        [lambda d: [d[1]], lambda d: [d[2]]], whitespace_tokenizer, key, (key, title, body)
    )

for r in index.query("red fruit", WeightedCount(), whitespace_tokenizer, [2.0, 1.0]):
    print(f"doc {r.key}: {r.score:.4f}")
