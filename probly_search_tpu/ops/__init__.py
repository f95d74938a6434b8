"""Device-side operators (JAX/XLA; Pallas variants for the hot paths).

These are the TPU-native replacements for the reference's pointer-chasing
query machinery:

* lanes.py  — posting-range expansion: (start, len) jobs -> flat gather lanes
  (replaces the per-posting linked-list walk, `query.rs:61-89`).
* merge.py  — sort-based segmented max/sum merge + top-k (replaces the
  HashMap `max_score_merger` accumulation, `query.rs:150-164`, and the final
  sort, `query.rs:103`).
* build.py  — batched on-device index build (sort + segment-sum + CSR pack),
  the vectorized analogue of per-document trie insertion (`index.rs:119-157`).
"""

from .lanes import ranges_to_lanes
from .merge import merge_scores_topk, segmented_scan

__all__ = ["ranges_to_lanes", "merge_scores_topk", "segmented_scan"]
