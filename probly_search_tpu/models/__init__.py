"""Scoring models.

Mirrors the reference's ``src/score/`` module layout: a pluggable scorer
protocol (`calculator.rs:33-70`) and the two built-in scorers, BM25
(`src/score/default/bm25.rs`) and zero-to-one
(`src/score/default/zero_to_one.rs`), each re-exported as a module with a
``new()`` factory to match the reference call sites
(``score::bm25::new()`` / ``score::zero_to_one::new()``).
"""

from . import bm25, zero_to_one
from .base import ScoreCalculator, TermData, FieldData

__all__ = ["bm25", "zero_to_one", "ScoreCalculator", "TermData", "FieldData"]
