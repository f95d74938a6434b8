"""Fully fused Pallas query kernel: DMA gather + score + merge.

The XLA step (index/device.py) pays a measured ~1.5us per posting-chunk
slice gather and materializes every stage in HBM.  This kernel executes one
block of query rows end-to-end in VMEM:

  per (row, chunk): async-copy rec[:, start:start+C] from HBM into VMEM
  compute liveness
  scorer lanes -> per-lane scores   (vectorized ScoreCalculator::score;
                                     df/idf are premultiplied on host into
                                     the per-job scale — see device.py)
  bitonic sort + segmented max/sum  (the max_score_merger rule,
                                     query.rs:150-164)
  iterative top-k                   (query.rs:103 + selection)

HBM traffic per dispatch = the postings actually touched + job metadata +
[B, k] results; every intermediate lives in VMEM.  The chunk tables
(start/len/qterm/scale) are computed by a tiny XLA prologue — the kernel
reads chunk starts from SMEM to issue DMAs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .merge import INVALID_KEY
from .pallas_merge import merge_body

_NEG_INF = float("-inf")

# Experiment knob (benchmarks/profile_dma.py): 0 = normal per-(row, chunk)
# DMAs; 1 = one whole-width DMA per row from offset 0 (WRONG results, same
# compute) — isolates DMA-issue cost.
_DMA_TEST_MODE = 0


def _query_kernel(
    scorer,
    C: int,
    k: int,
    qterm_bits: int,
    F: int,
    NC: int,
    phase: str,
    # refs:
    blk_live_ref,  # SMEM [G, 1] int32 — any live chunk per row block
    c_start_ref,  # SMEM [1, ROWS, NC] int32 — 128-aligned DMA starts
    c_live_ref,  # SMEM [1, ROWS, NC] int32 — chunk has payload (DMA guard)
    c_skip_ref,  # VMEM [1, ROWS, NC] int32 — payload begins at this lane
    c_len_ref,  # VMEM [1, ROWS, NC] int32
    c_qterm_ref,  # VMEM [1, ROWS, NC] int32
    c_scale_ref,  # VMEM [1, ROWS, NC] f32 — per-job scale (host before_each)
    scal_ref,  # VMEM [1, 2F] f32: field_avg[F], fields_boost[F]
    rec_ref,  # HBM [R, P + C] int32
    out_s_ref,  # VMEM [1, ROWS, k] f32 (phase "lanes": [1, ROWS, L])
    out_d_ref,  # VMEM [1, ROWS, k] int32 (phase "lanes": [1, ROWS, L])
    g_ref,  # scratch VMEM [ROWS, NC, R, C] int32
    ks,  # scratch VMEM [ROWS, L] int32 (merge keys)
    vs,  # scratch VMEM [ROWS, L] f32 (merge values)
    hs,  # scratch VMEM [ROWS, L] int32 (scan heads)
    sem,  # DMA sems [ROWS, NC]
):
    ROWS = c_len_ref.shape[1]
    L = NC * C
    ow = L if phase == "lanes" else k

    # Dead-block skip: class pad rows (template headroom, pow2 row pads)
    # arrive in whole dead blocks — emit the empty-row sentinel and skip
    # the gather + merge entirely, so row padding costs ~nothing on device
    # (the flag is precomputed by the XLA prologue, one scalar per block).
    blk_live = blk_live_ref[pl.program_id(0), 0]

    @pl.when(blk_live == 0)
    def _dead_block():
        out_s_ref[0, ...] = jnp.full((ROWS, ow), _NEG_INF, jnp.float32)
        out_d_ref[0, ...] = jnp.full((ROWS, ow), -1, jnp.int32)

    @pl.when(blk_live > 0)
    def _live_block():
        _query_kernel_body(
            scorer, C, k, qterm_bits, F, NC, phase,
            c_start_ref, c_live_ref, c_skip_ref, c_len_ref, c_qterm_ref,
            c_scale_ref, scal_ref, rec_ref, out_s_ref, out_d_ref,
            g_ref, ks, vs, hs, sem,
        )


def _query_kernel_body(
    scorer,
    C: int,
    k: int,
    qterm_bits: int,
    F: int,
    NC: int,
    phase: str,
    c_start_ref,
    c_live_ref,
    c_skip_ref,
    c_len_ref,
    c_qterm_ref,
    c_scale_ref,
    scal_ref,
    rec_ref,
    out_s_ref,
    out_d_ref,
    g_ref,
    ks,
    vs,
    hs,
    sem,
):
    ROWS = c_len_ref.shape[1]
    R = rec_ref.shape[0]
    L = NC * C

    # ---- gather: one 2-D DMA per (row, chunk) -------------------------- #
    if _DMA_TEST_MODE == 1:  # experiment: 1 small DMA per row, garbage data
        for r in range(ROWS):
            pltpu.make_async_copy(
                rec_ref.at[:, pl.ds(0, C)], g_ref.at[r, 0], sem.at[r, 0]
            ).start()
        for r in range(ROWS):
            pltpu.make_async_copy(
                rec_ref.at[:, pl.ds(0, C)], g_ref.at[r, 0], sem.at[r, 0]
            ).wait()
    else:
        # Dead padding chunks (class pad rows / NC pad slots) skip their DMA
        # entirely — the guard reads the scalar chunk-liveness table.  The
        # scratch then holds a stale gather, but every downstream read is
        # masked by in_pay (derived from c_skip/c_len, both 0 for dead
        # chunks), so the garbage never reaches a key or an unmasked score.
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
    if phase == "gather":
        # Phase probe: DMA gather only; a reduce of g defeats DCE.
        out_s_ref[0, ...] = jnp.sum(g.astype(jnp.float32), axis=(1, 2))[:, :k]
        out_d_ref[0, ...] = jnp.max(g[:, :, 0, :], axis=1)[:, :k]
        return
    doc = g[:, :, 0, :]  # [ROWS, NC, C] — true doc slot, even for dead docs
    tf = g[:, :, 1 : 1 + F, :].astype(jnp.float32)  # [ROWS, NC, F, C]
    flen = pltpu.bitcast(g[:, :, 1 + F : 1 + 2 * F, :], jnp.float32)
    alive = g[:, :, 1 + 2 * F, :] > 0  # liveness row (index/device.py rec)

    c_skip = c_skip_ref[0]
    c_len = c_len_ref[0]
    c_qterm = c_qterm_ref[0]
    c_scale = c_scale_ref[0]

    cpos = jax.lax.broadcasted_iota(jnp.int32, (ROWS, NC, C), 2)
    in_pay = (cpos >= c_skip[..., None]) & (cpos < (c_skip + c_len)[..., None])
    live = in_pay & alive

    # ---- scoring (vectorized scorer protocol) -------------------------- #
    from ..index.device import ScoreLanes

    lanes = ScoreLanes(
        tf=tf,
        field_length=flen,
        field_avg=scal_ref[0, 0:F],
        fields_boost=scal_ref[0, F : 2 * F],
        # scale is per-LANE in the scorer protocol (term-range jobs need
        # it); per-expansion jobs broadcast the per-chunk word.
        scale=c_scale[..., None],
        doc=doc,
        live=live,
        qterm=c_qterm,
    )
    score = scorer.device_score_lanes(lanes)  # [ROWS, NC, C]
    excl = bool(getattr(scorer, "device_excludes_nonpositive", False))
    if excl:
        # score() -> None postings never merge (bm25.rs:89-92): clamp to 0
        # here, drop not->0 doc totals post-merge (merge_body excl).
        score = jnp.where(score > 0.0, score, 0.0)
    # Pre-sorted-runs scheme: every chunk stays an ascending key run —
    # payload lanes keep their doc-sorted keys (CSR invariant,
    # index/segment.py), leading pads sink to -1, trailing pads rise to
    # INVALID_KEY.  Latently-dead docs keep ordered keys but poison their
    # totals with -inf (all of a doc's postings are dead together).
    score = jnp.where(in_pay, score, 0.0)
    score = jnp.where(in_pay & jnp.logical_not(alive), _NEG_INF, score)
    key = jnp.where(
        in_pay,
        (doc << qterm_bits) | c_qterm[..., None],
        jnp.where(cpos < c_skip[..., None], -1, INVALID_KEY),
    )

    if phase == "score":
        # Phase probe: gather + score + key build, no merge.
        out_s_ref[0, ...] = jnp.max(score, axis=1)[:, :k]
        out_d_ref[0, ...] = jnp.max(key, axis=1)[:, :k]
        return
    if phase == "lanes":
        # Scored lanes to HBM: the merge runs as staged XLA outside the
        # kernel (wide classes past _FUSED_MAX_LANES — the comparator
        # network compiles pathologically there, but the gather + scoring
        # still beat XLA's sequential slice-gather loop by ~10x).
        out_d_ref[0, ...] = key.reshape(ROWS, L)
        out_s_ref[0, ...] = score.reshape(ROWS, L)
        return

    # ---- merge + top-k (VMEM-resident, in-place pipeline) --------------- #
    if phase in ("sort", "scan"):
        pos = jax.lax.broadcasted_iota(jnp.int32, (ROWS, L), 1)
        ks[...] = key.reshape(ROWS, L)
        vs[...] = score.reshape(ROWS, L)
        from .pallas_merge import (
            _oddeven_merge_runs_inplace,
            _segmented_scan_inplace,
            _shift_left,
            _shift_right,
        )

        _oddeven_merge_runs_inplace(ks, vs, pos, C)
        if phase == "scan":
            kk = ks[...]
            hs[...] = (kk != _shift_right(kk, pos, 1, -1)).astype(jnp.int32)
            _segmented_scan_inplace(jnp.maximum, vs, hs, pos, _NEG_INF, bound=NC)
            tail1 = kk != _shift_left(kk, pos, 1, -1)
            vs[...] = jnp.where(tail1, vs[...], 0.0)
            dd = kk >> qterm_bits
            hs[...] = (dd != _shift_right(dd, pos, 1, -1)).astype(jnp.int32)
            _segmented_scan_inplace(jnp.add, vs, hs, pos, 0.0, bound=NC)
        out_s_ref[0, ...] = vs[...][:, :k]
        out_d_ref[0, ...] = ks[...][:, :k]
        return
    merge_body(
        k,
        qterm_bits,
        key.reshape(ROWS, L),
        score.reshape(ROWS, L),
        out_s_ref.at[0],
        out_d_ref.at[0],
        ks,
        vs,
        hs,
        run=C,
        excl=excl,
        # A doc appears at most once per gathered chunk, so every real
        # (doc, qterm) / doc run is <= NC lanes: log2(NC) scan steps.
        max_seg=NC,
    )


def fused_query_topk(
    scorer,
    rec,
    c_start,
    c_skip,
    c_len,
    c_qterm,
    c_scale,
    scalars,
    *,
    chunk: int,
    k: int,
    qterm_bits: int,
    num_fields: int,
    rows_per_block: int = 8,
    interpret: bool = False,
    phase: str = "full",
):
    """Run the fused kernel over a dispatch.

    Args mirror the XLA step's chunk tables; ``scalars`` is f32[1, 2F]
    = (field_avg, fields_boost); ``rec`` is the transposed posting record
    array int32[R, P + C].

    ``phase`` selects how much of the pipeline runs: "full" (default),
    "lanes" (gather + score, write [B, L] key/score lanes to HBM — the
    wide-class path and the staged-merge front end), or the profiling
    cuts "gather" / "score" / "sort" / "scan" (benchmarks/r5_session10.py).
    """
    B, NC = c_start.shape
    R0 = rec.shape[0]
    from .pallas_merge import pick_rows_per_block

    # In-place merge pipeline: ~60B/lane live (three scratch arrays + one
    # stage's temporaries) plus the gather scratch.  The lanes phase adds
    # two [rows, L] output blocks.
    rows = min(
        rows_per_block,
        pick_rows_per_block(
            B,
            NC * chunk,
            bytes_per_lane=(60 if phase != "lanes" else 68) + 4 * R0,
        ),
    )
    rows = min(rows, B)
    while B % rows:
        rows //= 2
    rows = max(rows, 1)
    grid = (B // rows,)
    G = B // rows
    R = rec.shape[0]
    C = chunk

    # Blocks must cover the full trailing dims (Pallas TPU block rule), so
    # the [B, NC] chunk tables are viewed as [G, rows, NC] with (1, rows,
    # NC) blocks.
    def r3(a):
        return a.reshape(G, rows, NC)

    kernel = functools.partial(
        _query_kernel, scorer, C, k, qterm_bits, num_fields, NC, phase
    )
    row_block = lambda i: (i, 0, 0)
    table = lambda space: pl.BlockSpec((1, rows, NC), row_block, memory_space=space)
    ow = NC * C if phase == "lanes" else k
    # The merge scratch is dead in the pre-merge phases; keep it minimal.
    sl = NC * C if phase in ("full", "sort", "scan") else 128
    c_live = (c_len > 0).astype(jnp.int32)  # scalar DMA guards (SMEM)
    # Per-block liveness flag (dead-block skip in the kernel): a block of
    # pure pad rows has no live chunk anywhere.
    # Full [G, 1] array in SMEM, indexed by program_id in the kernel —
    # Mosaic requires SMEM block shapes be (8,128)-divisible or equal to
    # the whole array, and [G, 1] scalars are tiny.
    blk_live = c_live.reshape(G, rows * NC).max(axis=1, keepdims=True)
    out_s, out_d = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(blk_live.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
            table(pltpu.SMEM),
            table(pltpu.SMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            table(pltpu.VMEM),
            pl.BlockSpec((1, scalars.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, ow), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ow), row_block, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, rows, ow), jnp.float32),
            jax.ShapeDtypeStruct((G, rows, ow), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, NC, R, C), jnp.int32),
            pltpu.VMEM((rows, sl), jnp.int32),
            pltpu.VMEM((rows, sl), jnp.float32),
            pltpu.VMEM((rows, sl), jnp.int32),
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
        r3(c_scale),
        scalars,
        rec,
    )
    return out_s.reshape(B, ow), out_d.reshape(B, ow)
