"""Device-side operators (JAX/XLA; Pallas variants for the hot paths).

These are the TPU-native replacements for the reference's pointer-chasing
query machinery:

* merge.py — sort-based segmented max/sum merge + top-k (replaces the
  HashMap `max_score_merger` accumulation, `query.rs:150-164`, and the final
  sort, `query.rs:103`).
* pallas_merge.py — the fused VMEM-resident Pallas variant of merge.py
  (bitonic sort + segmented scans + iterative top-k).
* pallas_query.py — the fully fused query kernel: DMA posting gather +
  scoring + merge in one VMEM-resident program.

Posting-range expansion ((start, len) jobs -> chunked gather lanes,
replacing the per-posting linked-list walk `query.rs:61-89`) lives inline in
the query step (`index/device.py:_query_step_impl`); the batched index
build (the vectorized analogue of per-document trie insertion,
`index.rs:119-157`) is the host pipeline `index/bulk.py` + the native
tokenizer — an on-device build cannot win behind a high-latency device
link.
"""

from .merge import merge_scores_topk, segmented_scan

__all__ = ["merge_scores_topk", "segmented_scan"]
