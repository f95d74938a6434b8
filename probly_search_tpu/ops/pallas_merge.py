"""Fused Pallas merge kernel: bitonic sort + segmented scans + top-k.

The XLA implementation of the score merge (ops/merge.py) materializes every
intermediate in HBM: the sort alone rewrites the [B, L] key/score arrays
per comparator stage group, and the two segmented scans plus top-k add
several more full passes.  This kernel keeps one block of query rows
resident in VMEM and performs the ENTIRE merge — the ``max_score_merger``
rule (`/root/reference/src/query.rs:150-164`) plus result selection
(`query.rs:103`) — in a single pass over HBM:

  load [ROWS, L] (key, score) -> VMEM
  bitonic sort by key       (comparator network expressed as lane ROTATES +
                             selects: partner i^j fetched with pltpu.roll,
                             so every stage is pure elementwise VPU work —
                             no gathers, no reshapes)
  segmented MAX over (doc, qterm) runs   ("max within a query term")
  segmented SUM over doc runs            ("sum across query terms")
  iterative top-k over doc-run tails
  store [ROWS, k] (scores, docs)

All shapes static; rows are independent so the grid tiles the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .merge import INVALID_KEY

_NEG_INF = float("-inf")  # plain python scalar: pallas kernels must not
# capture traced jnp constants

# Comparator-stage implementation (hardware A/B, PERFORMANCE.md r7
# session 4):
#   1 — symmetric predicates: is_low and is_high each computed from pos
#       (8 vector ops for the is_high chain in _ce_selected).
#   2 — the low-lane swap mask shifted onto the high lanes: is_high(i)
#       is exactly is_low(i - q) and a pair's swap decision is symmetric
#       (key[i] < key[i-q]  <=>  key[j] > key[j+q] at j = i-q), so one
#       lane roll of the int32 mask replaces the predicate chain.
#       Bit-exact: same comparisons, same strictness, same phantom-tail
#       guard (carried inside the low-lane mask).
# MEASURED (r7 session 4, interleaved pace A/B on chip): variant 2 is a
# slight LOSS (50.2 vs 48.4 ms/window median) — Mosaic constant-folds the
# iota-derived predicate chains, so variant 1's "extra ops" are free,
# while the mask roll is real data movement.  The ladder's cost is pure
# value movement; predicate algebra is exhausted as an optimization
# surface.  Variant 2 stays switchable (and bit-equal by test) as the
# recorded falsification.
# Read at trace time: switching requires re-tracing the kernels
# (index.device._STEP_CACHE.clear()).
CE_VARIANT = 1


def _lane_iota(rows: int, L: int):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, L), 1)


def _compare_exchange(key, val, pos, j: int, k: int):
    """One bitonic comparator stage via lane rotation.

    partner(i) = i ^ j; the rotated arrays provide x[i+j] and x[i-j], and
    each element selects the right one from its own (i & j) bit.  Elements
    that would wrap never select the wrapped branch, so circular rotation
    is safe.

    Non-power-of-two L (only reachable through the merge ladder, never the
    bitonic sort): the network runs on a VIRTUAL pow2 lane space whose tail
    [L, Lv) holds phantom +inf keys.  A real low lane paired with a phantom
    partner never swaps in an ascending merge (phantom >= every real key,
    including the INVALID_KEY trailing pads, with strict comparators), so
    suppressing those swaps — ``(pos | j) < L``; high lanes have pos|j ==
    pos and pass — computes exactly the virtual network restricted to the
    real lanes.
    """
    L = key.shape[-1]
    pk_l = pltpu.roll(key, L - j, 1)  # key[i + j]
    pk_r = pltpu.roll(key, j, 1)  # key[i - j]
    pv_l = pltpu.roll(val, L - j, 1)
    pv_r = pltpu.roll(val, j, 1)
    is_low = (pos & j) == 0
    pk = jnp.where(is_low, pk_l, pk_r)
    pv = jnp.where(is_low, pv_l, pv_r)
    if CE_VARIANT == 2 and k == 0:
        # Ascending-only stage (every merge-ladder use): the pair's swap
        # decision is computed once at the low lane and rolled onto the
        # high lane (partner of a low lane i is i + j under xor-pairing).
        sl = is_low & (key > pk_l)
        if L & (L - 1):  # phantom-tail guard: low lanes with partner >= L
            sl = sl & ((pos | j) < L)
        sl = sl.astype(jnp.int32)
        pair_swap = (sl | _shift_right(sl, pos, j, 0)) > 0
        return jnp.where(pair_swap, pk, key), jnp.where(pair_swap, pv, val)
    up = (pos & k) == 0
    key_low = jnp.where(is_low, key, pk)
    key_high = jnp.where(is_low, pk, key)
    # Ascending block: swap when low > high; descending: when low < high.
    # (Boolean logic, not where-on-bools: Mosaic rejects selects with i1
    # data operands.)
    pair_swap = (up & (key_low > key_high)) | (~up & (key_low < key_high))
    if L & (L - 1):  # phantom-tail guard, static no-op at pow2 widths
        assert k == 0, "bitonic (descending-block) stages require pow2 L"
        pair_swap = pair_swap & ((pos | j) < L)
    new_key = jnp.where(pair_swap, pk, key)
    new_val = jnp.where(pair_swap, pv, val)
    return new_key, new_val


def _bitonic_sort(key, val, pos):
    L = key.shape[-1]
    size = 2
    while size <= L:
        j = size // 2
        while j >= 1:
            key, val = _compare_exchange(key, val, pos, j, size)
            j //= 2
        size *= 2
    return key, val


def _shift_right(x, pos, d: int, fill):
    """x shifted d lanes right (toward higher index); first d lanes = fill."""
    rolled = pltpu.roll(x, d, 1)
    return jnp.where(pos < d, fill, rolled)


def _shift_left(x, pos, d: int, fill):
    L = x.shape[-1]
    rolled = pltpu.roll(x, L - d, 1)
    return jnp.where(pos >= L - d, fill, rolled)


def _segmented_scan(op, vals, heads, pos, identity):
    """Inclusive segmented scan (Hillis-Steele, log2 L steps).

    ``heads`` is int32 (1 = segment start) — masks live as int32 data
    because Mosaic cannot roll/select i1 vectors.
    """
    L = vals.shape[-1]
    d = 1
    while d < L:
        sv = _shift_right(vals, pos, d, identity)
        sh = _shift_right(heads, pos, d, 1)
        vals = jnp.where(heads > 0, vals, op(vals, sv))
        heads = heads | sh
        d *= 2
    return vals


def _ce_selected(key, val, pos, q: int, group: int):
    """Batcher odd-even-merge comparator stage: CE(i, i+q) for lanes with
    ``(i & q) != 0`` and ``i mod group < group - q`` (ascending).  Unpaired
    lanes pass through.  Partner values come from lane rotations; wrapped
    values are never selected (the predicates exclude group boundaries).
    """
    L = key.shape[-1]
    pk_l = pltpu.roll(key, L - q, 1)  # key[i + q]
    pk_r = pltpu.roll(key, q, 1)  # key[i - q]
    pv_l = pltpu.roll(val, L - q, 1)
    pv_r = pltpu.roll(val, q, 1)
    ingrp = pos & (group - 1)
    is_low = ((pos & q) != 0) & (ingrp < group - q)
    if L & (L - 1):  # virtual pow2 space: phantom (+inf) partners never swap
        is_low = is_low & (pos + q < L)
    pk = jnp.where(is_low, pk_l, pk_r)
    pv = jnp.where(is_low, pv_l, pv_r)
    if CE_VARIANT == 2:
        # is_high(i) == is_low(i - q) and the swap decision is symmetric
        # across the pair, so roll the low-lane mask instead of computing
        # the is_high predicate chain (CE_VARIANT doc above).
        sl = (is_low & (key > pk_l)).astype(jnp.int32)
        swap = (sl | _shift_right(sl, pos, q, 0)) > 0
        return jnp.where(swap, pk, key), jnp.where(swap, pv, val)
    prev = pos - q
    is_high = (pos >= q) & ((prev & q) != 0) & ((prev & (group - 1)) < group - q)
    swap = (is_low & (key > pk)) | (is_high & (key < pk))
    return jnp.where(swap, pk, key), jnp.where(swap, pv, val)


def _oddeven_merge_runs_inplace(key_ref, val_ref, pos, run: int):
    """Merge ascending runs of length ``run`` into one ascending row.

    Batcher's odd-even merge, one level per doubling: stage 1 pairs lanes at
    distance m across the two runs (partner ``i ^ m``, all ascending — the
    existing ``_compare_exchange`` with direction bit 0), then selected
    stages at q = m/2 .. 1.  ``1 + log2(m)`` stages per level vs the full
    bitonic sort's ``log2(L) * (log2(L)+1) / 2`` — the payoff for gathering
    posting chunks that are already doc-sorted (index/segment.py invariant).
    """
    L = pos.shape[-1]
    m = run
    while m < L:
        key, val = _compare_exchange(key_ref[...], val_ref[...], pos, m, 0)
        key_ref[...] = key
        val_ref[...] = val
        q = m // 2
        while q >= 1:
            key, val = _ce_selected(key_ref[...], val_ref[...], pos, q, 2 * m)
            key_ref[...] = key
            val_ref[...] = val
            q //= 2
        m *= 2


def _bitonic_sort_inplace(key_ref, val_ref, pos):
    """Bitonic sort writing every comparator stage through scratch refs.

    The functional form keeps O(stages) live [rows, L] buffers on Mosaic's
    scoped VMEM stack (~280B/lane); storing each stage bounds live memory to
    the two scratch arrays plus one stage's temporaries, lifting the lane
    width the kernel can handle.
    """
    L = pos.shape[-1]
    size = 2
    while size <= L:
        j = size // 2
        while j >= 1:
            key, val = _compare_exchange(key_ref[...], val_ref[...], pos, j, size)
            key_ref[...] = key
            val_ref[...] = val
            j //= 2
        size *= 2


def _segmented_scan_inplace(op, val_ref, head_ref, pos, identity, bound: int = 0):
    """Inclusive segmented scan through scratch refs.

    ``bound > 0`` declares every REAL segment is at most ``bound`` lanes
    long, cutting the Hillis-Steele ladder from log2(L) to ceil(log2(bound))
    steps.  Longer segments (the -1 / INVALID_KEY pad runs) get partial
    prefixes — safe because head flags still stop propagation INTO live
    segments and pad tails are masked off downstream.
    """
    L = pos.shape[-1]
    d = 1
    stop = bound if 0 < bound < L else L
    while d < stop:
        vals = val_ref[...]
        heads = head_ref[...]
        sv = _shift_right(vals, pos, d, identity)
        sh = _shift_right(heads, pos, d, 1)
        val_ref[...] = jnp.where(heads > 0, vals, op(vals, sv))
        head_ref[...] = heads | sh
        d *= 2


def merge_body(
    k: int,
    qterm_bits: int,
    key_in,
    score_in,
    out_s,
    out_d,
    ks,
    vs,
    hs,
    run: int = 0,
    excl: bool = False,
    max_seg: int = 0,
):
    """Shared merge pipeline over scratch refs ks (i32), vs (f32), hs (i32).

    ``key_in``/``score_in`` are [rows, L] values copied into the scratch
    refs.  Writes [rows, k] outputs through ``out_s``/``out_d`` refs.

    ``run > 0`` declares the input pre-sorted in ascending runs of that
    length (posting chunks are doc-sorted, index/segment.py), replacing the
    full bitonic sort with Batcher odd-even merge levels.  In that scheme
    dead lanes carry key ``-1`` (leading pads) or ``INVALID_KEY`` (trailing
    pads) and per-doc kill is by score ``-inf``; both sentinels are dropped
    by the final ``key >= 0`` / ``!= INVALID_KEY`` mask.

    ``excl=True`` applies the reference's nonpositive-total exclusion
    (bm25.rs:89-92) POST-merge: per-posting nonpositive scores must already
    be clamped to 0 by the caller, and docs whose total is not > 0 are
    dropped here.

    ``max_seg > 0`` bounds every real (doc, qterm) / doc run to that many
    lanes.  A doc appears at most once per gathered chunk (chunks slice a
    doc-sorted posting list), so callers with NC chunks per query pass
    NC — cutting each segmented scan from log2(L) to log2(NC) steps
    (measured: the two scans were ~1.5 ms of the 10.6 ms NC=16 kernel at
    the full log2(L) ladder, benchmarks/r5_session10.py).
    """
    rows, L = ks.shape
    pos = _lane_iota(rows, L)
    ks[...] = key_in
    vs[...] = score_in

    if 0 < run < L:
        _oddeven_merge_runs_inplace(ks, vs, pos, run)
    elif run == 0:
        _bitonic_sort_inplace(ks, vs, pos)
    # run >= L: a single ascending run per row — already sorted.
    key = ks[...]

    # Stage 1: max over runs of equal (doc, qterm) key.
    hs[...] = (key != _shift_right(key, pos, 1, -1)).astype(jnp.int32)
    _segmented_scan_inplace(jnp.maximum, vs, hs, pos, _NEG_INF, bound=max_seg)
    tail1 = key != _shift_left(key, pos, 1, -1)
    vs[...] = jnp.where(tail1, vs[...], 0.0)

    # Stage 2: sum per-term maxima over runs of equal doc.
    doc = key >> qterm_bits
    hs[...] = (doc != _shift_right(doc, pos, 1, -1)).astype(jnp.int32)
    _segmented_scan_inplace(jnp.add, vs, hs, pos, 0.0, bound=max_seg)
    tail2 = doc != _shift_left(doc, pos, 1, -1)
    live = (key != INVALID_KEY) & (key >= 0)
    keep = tail2 & live
    if excl:
        keep = keep & (vs[...] > 0.0)
    vs[...] = jnp.where(keep, vs[...], _NEG_INF)

    # Iterative top-k (k small); accumulate [rows, k] and store once.
    # Two cross-lane reductions per step (max score, min doc among ties):
    # the row is key-sorted so each doc has exactly ONE tail lane, and
    # equal-score ties resolve to the lowest doc — identical to picking the
    # lowest lane (docs ascend), which is the host oracle's tie order.
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, k), 1)
    acc_s = jnp.full((rows, k), _NEG_INF, jnp.float32)
    acc_d = jnp.full((rows, k), -1, jnp.int32)
    imax = jnp.iinfo(jnp.int32).max
    for i in range(k):
        vals = vs[...]
        m = jnp.max(vals, axis=1, keepdims=True)  # [rows, 1]
        ismax = vals == m
        d_sel = jnp.min(jnp.where(ismax, doc, imax), axis=1, keepdims=True)
        valid = m > _NEG_INF
        acc_s = jnp.where((col == i) & valid, m, acc_s)
        acc_d = jnp.where((col == i) & valid, d_sel, acc_d)
        vs[...] = jnp.where(ismax & (doc == d_sel), _NEG_INF, vals)
    out_s[...] = acc_s
    out_d[...] = acc_d


def _merge_kernel(
    k: int,
    qterm_bits: int,
    run: int,
    excl: bool,
    max_seg: int,
    key_ref,
    score_ref,
    out_s_ref,
    out_d_ref,
    ks,
    vs,
    hs,
):
    # input/output refs are [1, rows, L] / [1, rows, k] blocks (3-D so
    # trailing dims equal the array's; Pallas TPU block rule).
    merge_body(
        k,
        qterm_bits,
        key_ref[0],
        score_ref[0],
        out_s_ref.at[0],
        out_d_ref.at[0],
        ks,
        vs,
        hs,
        run=run,
        excl=excl,
        max_seg=max_seg,
    )


def pick_rows_per_block(B: int, L: int, bytes_per_lane: int = 60, budget: int = 12 << 20) -> int:
    """Rows per kernel block, bounded by a VMEM budget.  The in-place merge
    pipeline keeps three scratch arrays plus one stage's temporaries live
    (~60B/lane).  Measured: larger blocks (32 rows) run WORSE on this
    hardware (in-flight DMA pressure), so 8 stays the sweet spot."""
    rows = 8
    while rows > 1 and rows * L * bytes_per_lane > budget:
        rows //= 2
    rows = min(rows, B)
    while B % rows:
        rows //= 2
    return max(rows, 1)


def merge_scores_topk_pallas(
    key,
    score,
    k: int,
    qterm_bits: int,
    rows_per_block: int | None = None,
    interpret: bool = False,
    run: int = 0,
    excl: bool = False,
    max_seg: int = 0,
):
    """Drop-in replacement for ops.merge.merge_scores_topk on TPU.

    ``run``/``excl``/``max_seg`` select the pre-sorted-runs scheme and the
    bounded-scan ladder (see merge_body).
    """
    B, L = key.shape
    rows = rows_per_block or pick_rows_per_block(B, L)
    rows = min(rows, B)
    while B % rows:
        rows //= 2
    rows = max(rows, 1)
    G = B // rows
    grid = (G,)
    kernel = functools.partial(_merge_kernel, k, qterm_bits, run, excl, max_seg)
    out_s, out_d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, rows, k), jnp.float32),
            jax.ShapeDtypeStruct((G, rows, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, L), jnp.int32),
            pltpu.VMEM((rows, L), jnp.float32),
            pltpu.VMEM((rows, L), jnp.int32),
        ],
        interpret=interpret,
    )(key.reshape(G, rows, L), score.reshape(G, rows, L))
    return out_s.reshape(B, k), out_d.reshape(B, k)
