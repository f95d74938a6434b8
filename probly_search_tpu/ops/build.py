"""On-device index build pipeline: sort -> segment-count -> CSR mask.

The reference builds its index by per-document trie insertion
(`/root/reference/src/index.rs:119-157`) — O(term length) pointer chasing
per occurrence.  The TPU-native build (SURVEY §7) is a batched pipeline:

  host:   tokenize (pluggable callable) + intern term strings to ids
  device: sort occurrences by (term, doc) -> run-boundary detection ->
          per-field segmented counts = term frequencies -> CSR structure

Everything on device is static-shaped: the result is entry-aligned arrays
with a ``tail`` mask marking one representative per (term, doc) posting row;
the caller compacts with the mask (a cheap stream operation) or feeds the
masked arrays onward.

When to use: the host pipeline (index/bulk.py) wins when the corpus lives
on the host and the device link is thin; this path wins for device-resident
corpora and for sharded rebuilds (vacuum/compaction of a sharded index)
where the sort is the dominant cost and stays on-device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .merge import segmented_scan


def sort_and_count(
    term_ids, doc_ids, field_ids, num_fields: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Turn token occurrences into posting rows, on device.

    Args:
      term_ids, doc_ids, field_ids: int32[N] — one entry per token occurrence
        (the device analogue of the ``all_terms`` loop, index.rs:119).
      num_fields: static F.

    Returns:
      t_sorted, d_sorted: int32[N] sorted by (term, doc).
      tail: bool[N] — True on the LAST entry of each (term, doc) run; the
        entry where ``tf`` holds the completed per-field counts.
      tf: int32[N, F] — inclusive per-field running counts within the run
        (valid posting tf at ``tail`` positions).
    """
    t, d, f = jax.lax.sort((term_ids, doc_ids, field_ids), num_keys=2)
    first = jnp.ones_like(t, dtype=bool).at[1:].set((t[1:] != t[:-1]) | (d[1:] != d[:-1]))
    # Per-field occurrence indicator -> segmented running count per run.
    ind = (f[:, None] == jnp.arange(num_fields, dtype=f.dtype)[None, :]).astype(jnp.int32)
    tf = jax.vmap(
        lambda col: segmented_scan(jnp.add, col[None, :], first[None, :])[0],
        in_axes=1,
        out_axes=1,
    )(ind)
    tail = jnp.ones_like(t, dtype=bool).at[:-1].set(first[1:])
    return t, d, tail, tf


def csr_offsets(t_sorted, tail, num_terms: int) -> jnp.ndarray:
    """CSR offsets over posting rows: offsets[T + 1] with
    ``offsets[t+1] - offsets[t]`` = number of (term, doc) rows of term t."""
    rows_per_term = jax.ops.segment_sum(
        tail.astype(jnp.int32), t_sorted, num_segments=num_terms
    )
    return jnp.concatenate(
        [jnp.zeros(1, dtype=jnp.int64), jnp.cumsum(rows_per_term).astype(jnp.int64)]
    )
