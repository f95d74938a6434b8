"""Posting-range expansion: jobs -> gather lanes.

A query is planned on the host into **jobs**: one job per (query term
expansion x segment), described by a (start, len) range into the device's
concatenated posting arrays.  This op expands the jobs of one query into a
flat, fixed-width array of **lanes** — one lane per posting — entirely on
device (vectorized segment-arange via cumsum + searchsorted), so the host
never materializes per-posting indices.

This replaces the reference's sequential posting-list walk
(`/root/reference/src/query.rs:61-89`) with a static-shaped gather plan that
XLA can fuse with the downstream scoring math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ranges_to_lanes(job_start, job_len, num_lanes: int, dummy_post: int):
    """Expand (start, len) ranges into flat posting-index lanes.

    Args:
      job_start: int32[J] — start offset of each job in the posting arrays.
      job_len:   int32[J] — number of postings in each job (0 = padding job).
      num_lanes: static L — output width; lanes beyond the total are padding.
      dummy_post: posting index used for padding lanes (points at the dummy
        posting row appended to the device arrays).

    Returns:
      lane_post: int32[L] — posting index per lane (dummy for padding).
      lane_job:  int32[L] — owning job per lane (clamped for padding).
      lane_valid: bool[L].
    """
    J = job_start.shape[0]
    cum = jnp.cumsum(job_len)  # [J] — end position of each job in lane space
    total = cum[-1]
    lane = jnp.arange(num_lanes, dtype=jnp.int32)
    # Owning job: first j with cum[j] > lane.
    lane_job = jnp.searchsorted(cum, lane, side="right").astype(jnp.int32)
    valid = lane < total
    jc = jnp.minimum(lane_job, J - 1)
    job_begin = cum[jc] - job_len[jc]  # job's first position in lane space
    lane_post = job_start[jc] + (lane - job_begin)
    lane_post = jnp.where(valid, lane_post, jnp.int32(dummy_post))
    return lane_post, jc, valid
