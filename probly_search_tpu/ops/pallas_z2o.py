"""Fused Pallas kernel for the zero-to-one FAST program.

The staged XLA fast program (ops/z2o_device.z2o_fast_step) is
device-compute bound at serving widths: a 2-key ``lax.sort`` over [B, L]
posting lanes carrying one contribution operand per field, with every
stage materialized in HBM.  This kernel runs one block of query rows
end-to-end in VMEM, exactly like the BM25 fused kernel
(ops/pallas_query.py):

  per (row, chunk): async-copy rec[:, start:start+C] from HBM into VMEM
  build (k1, packed2, contrib_f...) lanes       (zero_to_one.rs:53-80)
  odd-even MERGE of the pre-sorted chunk runs   (CSR doc order invariant)
    ordered by the lexicographic 2-key (k1, packed2)
  per field: first-valid segmented scan         ("best entry per (doc,
    field, qterm)" — the loop-free reduction of zero_to_one.rs:98-121
    for shared-node-free queries; see z2o_fast_step's docstring)
  per-doc pool sums, max over fields            (zero_to_one.rs:118-122)
  iterative top-k

SECONDARY SORT KEY: the oracle orders a (doc, field, qterm) group by
(score desc, enumeration asc).  Comparator networks are not stable, so the
tiebreak must be IN the key: the host packs each job's per-query dense
score RANK (descending, ties equal — computed on the f32 score bits the
oracle compares) into the job's spare word, and the kernel forms
``packed2 = rank << 14 | lane_index`` (rank < 256 jobs/query, lane index
< 2^14 = the fused lane cap).  Ascending (k1, packed2) therefore equals
the oracle's stable (segment, score desc, enumeration) order exactly.

Cost model: the merge network from C-runs to L is ``sum(1 + log2 m)``
stages, each rolling 2 + F carried arrays; stays within the measured
Mosaic compile envelope at L <= 8192 (the 16384-lane cap is a toolchain
bound — CLAUDE.md)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
_I32_MAX = 2**31 - 1
_QT_BITS = 4

# Caps for the fused branch (staged XLA beyond): lane width bounded by the
# Mosaic compile envelope with 2 + F carried arrays; fields bounded to keep
# the comparator roll count near the proven BM25-at-16384 program size.
FUSED_Z2O_MAX_LANES = 8192
FUSED_Z2O_MAX_FIELDS = 4


def _roll(x, d):
    return pltpu.roll(x, d, 1)


def _ce2(keys, vals, pos, j: int):
    """One all-ascending bitonic/merge stage at distance ``j`` (direction
    bit 0): partner(i) = i ^ j, ordered by lexicographic (k1, k2).

    Non-pow2 L: virtual pow2 lane space with a phantom lexicographic-max
    tail — real-low lanes paired with phantom partners never swap (see
    pallas_merge._compare_exchange; phantom = (I32_MAX, I32_MAX) dominates
    every real (k1, k2) with strict comparators)."""
    k1, k2 = keys
    L = k1.shape[-1]
    is_low = (pos & j) == 0

    def partner(x):
        return jnp.where(is_low, _roll(x, L - j), _roll(x, j))

    pk1, pk2 = partner(k1), partner(k2)
    gt = (k1 > pk1) | ((k1 == pk1) & (k2 > pk2))
    from .pallas_merge import CE_VARIANT

    if CE_VARIANT == 2:
        # Pair-symmetric swap via the shifted low-lane mask (see
        # pallas_merge.CE_VARIANT): high-lane lt(i) == low-lane gt(i-j).
        sl = is_low & gt
        if L & (L - 1):
            sl = sl & ((pos | j) < L)
        sl = sl.astype(jnp.int32)
        swap = (sl | _shift_right(sl, pos, j, 0)) > 0
    else:
        lt = (k1 < pk1) | ((k1 == pk1) & (k2 < pk2))
        swap = (is_low & gt) | (~is_low & lt)
        if L & (L - 1):  # phantom-tail guard, static no-op at pow2 widths
            swap = swap & ((pos | j) < L)
    new_keys = (jnp.where(swap, pk1, k1), jnp.where(swap, pk2, k2))
    new_vals = tuple(jnp.where(swap, partner(v), v) for v in vals)
    return new_keys, new_vals


def _ce2_selected(keys, vals, pos, q: int, group: int):
    """Batcher odd-even-merge selected stage (see pallas_merge._ce_selected)
    with the lexicographic 2-key order."""
    k1, k2 = keys
    L = k1.shape[-1]
    ingrp = pos & (group - 1)
    is_low = ((pos & q) != 0) & (ingrp < group - q)
    if L & (L - 1):  # virtual pow2 space: phantom partners never swap
        is_low = is_low & (pos + q < L)

    def partner(x):
        return jnp.where(is_low, _roll(x, L - q), _roll(x, q))

    pk1, pk2 = partner(k1), partner(k2)
    gt = (k1 > pk1) | ((k1 == pk1) & (k2 > pk2))
    from .pallas_merge import CE_VARIANT

    if CE_VARIANT == 2:
        # is_high(i) == is_low(i - q); roll the low-lane swap mask (see
        # pallas_merge.CE_VARIANT).
        sl = (is_low & gt).astype(jnp.int32)
        swap = (sl | _shift_right(sl, pos, q, 0)) > 0
    else:
        prev = pos - q
        is_high = (
            (pos >= q) & ((prev & q) != 0) & ((prev & (group - 1)) < group - q)
        )
        lt = (k1 < pk1) | ((k1 == pk1) & (k2 < pk2))
        swap = (is_low & gt) | (is_high & lt)
    new_keys = (jnp.where(swap, pk1, k1), jnp.where(swap, pk2, k2))
    new_vals = tuple(jnp.where(swap, partner(v), v) for v in vals)
    return new_keys, new_vals


def _oddeven_merge2_inplace(k1_ref, k2_ref, val_refs, pos, run: int):
    """Merge ascending runs of ``run`` lanes under (k1, k2) order, writing
    every stage through the scratch refs (bounds live VMEM)."""
    L = pos.shape[-1]

    def load():
        return (k1_ref[...], k2_ref[...]), tuple(v[...] for v in val_refs)

    def store(keys, vals):
        k1_ref[...], k2_ref[...] = keys
        for ref, v in zip(val_refs, vals):
            ref[...] = v

    m = run
    while m < L:
        keys, vals = load()
        store(*_ce2(keys, vals, pos, m))
        q = m // 2
        while q >= 1:
            keys, vals = load()
            store(*_ce2_selected(keys, vals, pos, q, 2 * m))
            q //= 2
        m *= 2


def _shift_right(x, pos, d: int, fill):
    return jnp.where(pos < d, fill, _roll(x, d))


def _shift_left(x, pos, d: int, fill):
    L = x.shape[-1]
    return jnp.where(pos >= L - d, fill, _roll(x, L - d))


def _segscan_inplace(op, val_ref, head_ref, pos, identity, bound: int = 0):
    """Inclusive segmented scan; ``bound > 0`` caps real-segment length,
    cutting the ladder to ceil(log2(bound)) steps (pad runs may get partial
    prefixes — masked off downstream; see pallas_merge)."""
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


def _z2o_kernel(
    C: int,
    k: int,
    F: int,
    NC: int,
    # refs:
    blk_live_ref,  # SMEM [G, 1] int32 — any live chunk per row block
    c_start_ref,  # SMEM [1, ROWS, NC] int32 — 128-aligned DMA starts
    c_live_ref,  # SMEM [1, ROWS, NC] int32 — chunk has payload (DMA guard)
    c_skip_ref,  # VMEM [1, ROWS, NC] int32
    c_len_ref,  # VMEM [1, ROWS, NC] int32
    c_qterm_ref,  # VMEM [1, ROWS, NC] int32
    c_score_ref,  # VMEM [1, ROWS, NC] f32 — per-job entry score s
    c_rank_ref,  # VMEM [1, ROWS, NC] int32 — per-query dense score rank
    c_qlen_ref,  # VMEM [1, ROWS, NC] f32 — query_terms_len (incl. empties),
    # broadcast per chunk on host: a [ROWS]-shaped operand would need a
    # [1,1,ROWS]->[ROWS,1,1] vector shape cast, which the REAL Mosaic
    # backend rejects ("infer-vector-layout: unsupported shape cast" —
    # benchmarks/probe_fused_z2o.py, r5)
    rec_ref,  # HBM [R, P + C] int32
    out_s_ref,  # VMEM [1, ROWS, k] f32
    out_d_ref,  # VMEM [1, ROWS, k] int32
    g_ref,  # scratch VMEM [ROWS, NC, R, C] int32
    k1s,  # scratch VMEM [ROWS, L] int32
    k2s,  # scratch VMEM [ROWS, L] int32
    hs,  # scratch VMEM [ROWS, L] int32
    ps,  # scratch VMEM [ROWS, L] f32 (pool accumulator / doc max)
    cs,  # scratch VMEM [ROWS, F * L] f32 (per-field contribs, F blocks)
    sem,  # DMA sems [ROWS, NC]
):
    ROWS = c_len_ref.shape[1]

    # Dead-block skip (see ops/pallas_query.py): whole pad-row blocks emit
    # sentinels and skip the gather + lockstep machinery entirely.
    blk_live = blk_live_ref[pl.program_id(0), 0]

    @pl.when(blk_live == 0)
    def _dead_block():
        out_s_ref[0, ...] = jnp.full((ROWS, k), float("-inf"), jnp.float32)
        out_d_ref[0, ...] = jnp.full((ROWS, k), -1, jnp.int32)

    @pl.when(blk_live > 0)
    def _live_block():
        _z2o_kernel_body(
            C, k, F, NC, c_start_ref, c_live_ref, c_skip_ref, c_len_ref,
            c_qterm_ref, c_score_ref, c_rank_ref, c_qlen_ref, rec_ref,
            out_s_ref, out_d_ref, g_ref, k1s, k2s, hs, ps, cs, sem,
        )


def _z2o_kernel_body(
    C: int,
    k: int,
    F: int,
    NC: int,
    c_start_ref,
    c_live_ref,
    c_skip_ref,
    c_len_ref,
    c_qterm_ref,
    c_score_ref,
    c_rank_ref,
    c_qlen_ref,
    rec_ref,
    out_s_ref,
    out_d_ref,
    g_ref,
    k1s,
    k2s,
    hs,
    ps,
    cs,
    sem,
):
    ROWS = c_len_ref.shape[1]
    R = rec_ref.shape[0]
    L = NC * C

    # Dead padding chunks skip their DMA (scalar guard; stale scratch reads
    # are in_pay-masked downstream — see ops/pallas_query.py).
    for r in range(ROWS):
        for c in range(NC):

            @pl.when(c_live_ref[0, r, c] > 0)
            def _start(r=r, c=c):
                s = pl.multiple_of(c_start_ref[0, r, c], 128)
                pltpu.make_async_copy(
                    rec_ref.at[:, pl.ds(s, C)], g_ref.at[r, c], sem.at[r, c]
                ).start()

    for r in range(ROWS):
        for c in range(NC):

            @pl.when(c_live_ref[0, r, c] > 0)
            def _wait(r=r, c=c):
                s = pl.multiple_of(c_start_ref[0, r, c], 128)
                pltpu.make_async_copy(
                    rec_ref.at[:, pl.ds(s, C)], g_ref.at[r, c], sem.at[r, c]
                ).wait()

    g = g_ref[:, :, :, :]  # [ROWS, NC, R, C]
    doc = g[:, :, 0, :]  # [ROWS, NC, C]
    alive_i = g[:, :, 1 + 2 * F, :]  # 0/1 liveness row

    c_skip = c_skip_ref[0]
    c_len = c_len_ref[0]
    c_qterm = c_qterm_ref[0]
    c_score = c_score_ref[0]
    c_rank = c_rank_ref[0]

    cpos = jax.lax.broadcasted_iota(jnp.int32, (ROWS, NC, C), 2)
    in_pay = (cpos >= c_skip[..., None]) & (cpos < (c_skip + c_len)[..., None])
    live = in_pay & (alive_i > 0)

    pos = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 1)
    # Pre-sorted-runs invariant (the merge network's contract): every
    # payload lane — live OR latently dead — keeps its ordered key, leading
    # pads sink to -1, trailing pads rise to I32_MAX (exactly the BM25
    # fused kernel's scheme, ops/pallas_query.py).  Liveness rides IN the
    # key (bit 4): all of a doc's lanes are dead together, so the doc-tail
    # lane's bit decides, and (doc, alive, qterm) groups equal (doc, qterm)
    # groups.  k1 = doc << 5 | alive << 4 | qterm (doc < 2^26);
    # packed2 = rank << 14 | lane (see module doc).
    k1 = jnp.where(
        in_pay,
        (doc << (_QT_BITS + 1)) | (alive_i << _QT_BITS) | c_qterm[..., None],
        jnp.where(cpos < c_skip[..., None], -1, _I32_MAX),
    )
    k1s[...] = k1.reshape(ROWS, L)
    # Build packed2 in [ROWS, NC, C] space with a materialized lane iota:
    # reshaping a PURE broadcast of c_rank is a lane-replicated layout the
    # real Mosaic backend rejects ("Not implemented: Unsupported reshape" —
    # benchmarks/probe_fused_z2o.py, r5); OR-ing the iota in first gives the
    # value a standard layout, and the [ROWS, NC, C] -> [ROWS, L] collapse
    # then lowers exactly like k1's (the BM25 kernel's proven pattern).
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (ROWS, NC, C), 1) * C + cpos
    k2 = (c_rank[..., None] << 14) | lane3
    k2s[...] = k2.reshape(ROWS, L)

    s_l = jnp.broadcast_to(c_score[..., None], (ROWS, NC, C))
    qlen_c = c_qlen_ref[0]  # [ROWS, NC]
    for f in range(F):
        tf = g[:, :, 1 + f, :].astype(jnp.float32)
        flen = pltpu.bitcast(g[:, :, 1 + F + f, :], jnp.float32)
        contrib = (
            jnp.minimum(s_l / tf, 1.0)
            * tf
            / jnp.maximum(flen, qlen_c[..., None])
        )
        contrib = jnp.where(live & (tf > 0.0), contrib, -1.0)
        cs[:, f * L : (f + 1) * L] = contrib.reshape(ROWS, L)

    # ---- merge pre-sorted chunk runs under (k1, packed2) ---------------- #
    val_refs = [cs.at[:, f * L : (f + 1) * L] for f in range(F)]
    _oddeven_merge2_inplace(k1s, k2s, val_refs, pos, C)

    key = k1s[...]
    valid = (key != _I32_MAX) & (key >= 0)
    head1 = (key != _shift_right(key, pos, 1, -1)).astype(jnp.int32)
    tail1 = key != _shift_left(key, pos, 1, -1)
    dock = jnp.where(valid, key >> (_QT_BITS + 1), _I32_MAX)
    alive_b = jnp.bitwise_and(key >> _QT_BITS, 1) > 0
    head_d = ((dock != _shift_right(dock, pos, 1, -1)) & valid).astype(jnp.int32)
    tail_d = dock != _shift_left(dock, pos, 1, -1)

    def first_valid(cur, left):
        # scan combine: the EARLIER aggregate wins when defined (>= 0) —
        # "first valid in the group", the oracle's best-entry choice.
        return jnp.where(left >= 0.0, left, cur)

    doc_best = jnp.full((ROWS, L), _NEG_INF, jnp.float32)
    # A doc appears at most once per gathered chunk, so every real
    # (doc, alive, qterm) / doc run is <= NC lanes: log2(NC) scan steps
    # instead of log2(L) (2F scans — the biggest ladder in this kernel).
    for f in range(F):
        ref = val_refs[f]
        # first valid contribution per (doc, qterm) group
        hs[...] = head1
        _segscan_inplace(first_valid, ref, hs, pos, -1.0, bound=NC)
        first = ref[...]
        ref[...] = jnp.where(tail1 & (first >= 0.0), first, 0.0)
        # pool sum per doc
        hs[...] = head_d
        _segscan_inplace(jnp.add, ref, hs, pos, 0.0, bound=NC)
        doc_best = jnp.maximum(doc_best, ref[...])

    # Latently-dead docs are excluded by their key bit (zero_to_one is a
    # candidate-only scorer: docs always score >= 0, zero_to_one.rs:81).
    final = jnp.where(
        tail_d & valid & alive_b, jnp.maximum(doc_best, 0.0), _NEG_INF
    )
    ps[...] = final

    # ---- iterative top-k ------------------------------------------------ #
    # Two cross-lane reductions per step (max score, min doc among ties):
    # docs ascend along the sorted row, so min doc == min lane — the
    # oracle's tie order (see pallas_merge.merge_body).
    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, k), 1)
    acc_s = jnp.full((ROWS, k), _NEG_INF, jnp.float32)
    acc_d = jnp.full((ROWS, k), -1, jnp.int32)
    for i in range(k):
        vals = ps[...]
        m = jnp.max(vals, axis=1, keepdims=True)
        ismax = vals == m
        d_sel = jnp.min(jnp.where(ismax, dock, _I32_MAX), axis=1, keepdims=True)
        ok = m > _NEG_INF
        acc_s = jnp.where((col == i) & ok, m, acc_s)
        acc_d = jnp.where((col == i) & ok, d_sel, acc_d)
        ps[...] = jnp.where(ismax & (dock == d_sel), _NEG_INF, vals)
    out_s_ref[...] = acc_s[None]
    out_d_ref[...] = acc_d[None]


def fused_z2o_topk(
    rec,
    c_start,
    c_skip,
    c_len,
    c_qterm,
    c_score,
    c_rank,
    qlen,
    *,
    chunk: int,
    k: int,
    num_fields: int,
    rows_per_block: int = 8,
    interpret: bool = False,
):
    """Run the fused z2o fast kernel over a dispatch.

    Chunk tables mirror z2o_fast_step's XLA prologue; ``c_rank`` is the
    per-chunk job score rank (words[:, 2] in fast-mode job tables) and
    ``qlen`` is f32[B].
    """
    B, NC = c_start.shape
    R0 = rec.shape[0]
    F = num_fields
    from .pallas_merge import pick_rows_per_block

    L = NC * chunk
    # Carried arrays: k1, k2, heads, pool, F contribs (+ one stage's
    # temporaries) plus the gather scratch.
    rows = min(
        rows_per_block,
        pick_rows_per_block(B, L, bytes_per_lane=40 + 8 * F + 4 * R0),
    )
    rows = min(rows, B)
    while B % rows:
        rows //= 2
    rows = max(rows, 1)
    G = B // rows
    C = chunk

    def r3(a):
        return a.reshape(G, rows, NC)

    kernel = functools.partial(_z2o_kernel, C, k, F, NC)
    row_block = lambda i: (i, 0, 0)
    table = lambda space: pl.BlockSpec((1, rows, NC), row_block, memory_space=space)
    c_live = (c_len > 0).astype(jnp.int32)  # scalar DMA guards (SMEM)
    # Full [G, 1] array in SMEM, indexed by program_id in the kernel (see
    # ops/pallas_query.py — Mosaic SMEM block-shape rule).
    blk_live = c_live.reshape(G, rows * NC).max(axis=1, keepdims=True)
    out_s, out_d = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(blk_live.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            table(pltpu.SMEM),
            table(pltpu.SMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, k), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, k), row_block, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, rows, k), jnp.float32),
            jax.ShapeDtypeStruct((G, rows, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, NC, R0, C), jnp.int32),
            pltpu.VMEM((rows, L), jnp.int32),
            pltpu.VMEM((rows, L), jnp.int32),
            pltpu.VMEM((rows, L), jnp.int32),
            pltpu.VMEM((rows, L), jnp.float32),
            pltpu.VMEM((rows, F * L), jnp.float32),
            pltpu.SemaphoreType.DMA((rows, NC)),
        ],
        interpret=interpret,
    )(
        blk_live,
        r3(c_start),
        r3(c_live),
        r3(c_skip),
        r3(c_len),
        r3(c_qterm),
        r3(c_score),
        r3(c_rank),
        r3(jnp.broadcast_to(jnp.asarray(qlen)[:, None], (B, NC))),
        rec,
    )
    return out_s.reshape(B, k), out_d.reshape(B, k)
