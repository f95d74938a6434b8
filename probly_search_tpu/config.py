"""Configuration knobs.

The reference has no config system — all configuration is constructor
arguments (`/root/reference/src/index.rs:37-60`) and scorer struct fields
(`bm25.rs:14-26`).  This dataclass mirrors exactly those knobs and adds the
TPU-specific ones (tile sizes, bucketing, dtype policy, mesh layout).
"""

from __future__ import annotations

from dataclasses import dataclass


class HostFallbackError(RuntimeError):
    """Raised when ``IndexConfig.host_fallback = "error"`` and a device-path
    query would degrade to host-speed serving (see ``host_fallback``)."""


@dataclass
class IndexConfig:
    # --- reference-mirrored knobs -----------------------------------------
    # `Index::new_with_capacity(fields_num, expected_index_size,
    #  expected_documents_count)` — index.rs:42-60 (defaults at index.rs:38).
    # ``expected_documents_count`` pre-sizes the doc-store arrays
    # (index/core.py).  ``expected_index_size`` (the reference's trie-node
    # arena capacity hint, index.rs:42-60) is accepted for constructor
    # parity but is a documented NO-OP here: the trie was replaced by
    # sorted-term CSR segments whose arrays are sized exactly at build time,
    # so there is no arena to pre-size.
    expected_index_size: int = 1000
    expected_documents_count: int = 10000

    # --- delta-segment / LSM policy ---------------------------------------
    # Pending host-side adds are flushed into an immutable delta segment when
    # a query arrives or when the pending buffer exceeds this many documents.
    # The buffer holds raw (key, field values) tuples — flush work is O(batch)
    # through the native CSR pass, so a large window costs only references;
    # small windows cost extra segments and routine merges (r5: 8192 -> 12
    # segments + a full merge per 100k sequential adds).
    pending_flush_docs: int = 65536
    # When the number of delta segments exceeds this, they are merged into
    # the base segment (amortized compaction; `vacuum()` always fully merges).
    max_segments: int = 8

    # --- device / TPU knobs -------------------------------------------------
    # Max expansions per query term admitted to the device job path.
    # 0 = uncapped (the default, matching the reference's uncapped trie
    # DFS): expansion-heavy queries (single-char prefixes) tile through the
    # device job machinery like any other query.  A positive value routes
    # over-cap queries to the scorer's vectorized host path instead.
    max_expansions: int = 0
    # Max query terms per query on the device path.
    max_query_terms: int = 16
    # Expansion count at which a query term switches from per-expansion
    # jobs to TERM-RANGE jobs: one job covering the term's whole contiguous
    # expansion range in the CSR, with idf/term-length read per posting
    # from the static aux record array (index/device.py).  Kills the
    # one-chunk-per-tiny-term padding that would otherwise make single-char
    # prefix queries explode.  0 disables range jobs.
    range_min_expansions: int = 64
    # NOTE on dtype policy (there is deliberately NO dtype knob): device
    # scoring/merging is fixed f32 and the host oracle path is fixed f64.
    # The parity contract (device within 2e-5 relative of the f64 oracle
    # with equal rankings) is part of the public surface, and the measured
    # failure modes that shaped it — the TPU VPU's ~1e-4-relative
    # transcendentals (PERFORMANCE.md r4) — leave no room for a lower
    # compute precision; a bf16 lane experiment would also not cut VMEM
    # traffic (the gathered posting record is int32 regardless).
    # Default top-k for the device query path.
    default_top_k: int = 10
    # Posting-chunk width of the device gather (lanes per DMA slice; 128 of
    # each chunk is Mosaic alignment slack).  0 = engine default.
    chunk_size: int = 0
    # Compact device->host result format: the packed window result becomes
    # int16[rows, 3, k] (f16 score bits, slot lo16, slot hi16) — 25% fewer
    # bytes through the serving bottleneck (the D2H fetch, PERFORMANCE.md).
    # Rankings are computed on device in f32 and unchanged; only the
    # REPORTED scores are f16-quantized (~5e-4 relative), so this is
    # opt-in and off by default to keep the f32 parity surface.
    compact_results: bool = False
    # Device->host result format for the packed window result; overrides
    # compact_results when set:
    #   "f32"     int32[rows, 2, k] — f32 score bits + int32 slots (80 B per
    #             query at k=10; the default, full parity surface)
    #   "compact" int16[rows, 3, k] — f16 score bits + slot lo/hi (60 B)
    #   "slots"   int8[rows, 3, k]  — slot bytes only, NO scores (30 B).
    #             Rankings are still computed on device in f32; only the
    #             score REPORT is dropped, so `get_arrays` returns
    #             scores=None and `.get()` (which builds QueryResult
    #             objects) is unavailable.  Requires doc slots < 2^23.
    #   "slots20" int8[rows, 2k+ceil(k/2)] — 20-bit nibble-packed slots
    #             (25 B at k=10, the entropy floor for top-10 of 1M docs);
    #             same slots-only contract.  Requires doc slots < 2^20;
    #             windows that do not fit auto-downgrade to "slots" /
    #             "compact" (index/device.py resolve_result_format).
    # The fetch is the serving pace-setter on tunneled devices
    # (PERFORMANCE.md): fewer drained bytes per query = higher QPS.
    result_format: str = ""

    def effective_result_format(self) -> str:
        if self.result_format:
            return self.result_format
        return "compact" if self.compact_results else "f32"
    # Block-max safe top-k pruning (index/prune.py): plan-time removal of
    # posting chunks that provably cannot reach the requested top-k —
    # per-chunk score upper bounds vs an achievable k-th-best threshold,
    # the production-engine WAND/block-max machinery adapted to this
    # engine's chunked execution model.  EXACT: surviving top-k rows are
    # bit-equal to the unpruned window (tests/test_prune.py asserts it);
    # pruning auto-disables wherever safety cannot be proven (k >
    # prune_max_top_k, negative boosts, term-range queries, scorers
    # without device_impact, non-finite field averages).  Wins are on
    # single-term / idf-skewed queries; uniform multi-term disjunctions
    # (the headline bench) prune ~nothing — the known weak spot of
    # WAND-family bounds (see the prune.py module docstring).
    prune_blocks: bool = True
    # Relative safety margin baked into the static bounds (inflates chunk
    # upper bounds, deflates thresholds).  Must dominate the device's f32
    # drift vs the f64 oracle (measured <= 2e-5).
    prune_margin: float = 1e-4
    # Top-K ladder depth stored per job; requests with top_k above this
    # are never pruned.
    prune_max_top_k: int = 16
    # Heavy-query result cache: a query whose device plan spans at least
    # this many posting chunks (~0.9M postings at the default chunk width)
    # is served from a snapshot-static per-(scorer, job-table, boosts)
    # top-k cache — the first encounter computes it once through the normal
    # device path (a full-index prefix scan costs ~460 ms, PERFORMANCE.md);
    # every repeat is a host lookup.  Exact: the job table IS the query's
    # device program input, so equal tables give equal results.  0 disables.
    heavy_cache_min_chunks: int = 1024
    # Top-k depth stored per cached heavy query (requests with larger k
    # bypass the cache).
    heavy_cache_top_k: int = 128
    # LIGHT-CLASS chunk width (EXPERIMENTAL, default off): queries whose
    # merged lane count would strictly shrink are classed at this
    # smaller chunk width instead of the global one.  Motivation: the r8
    # lane census (benchmarks/r8s13_lanestats.py) measured 37.6% of the
    # headline window's chunk-grid lanes as in-chunk tail padding,
    # concentrated in light classes (the dominant NC=3 class carries
    # only 21.6% payload).  Results are EXACT at any valid width (pow2,
    # 128-divisible, below the global width — chunks stay ascending
    # doc-sorted runs; tests/test_light_classes.py pins bit-equality
    # across all three dispatch paths, on-chip included).  DEFAULT OFF
    # because the premise FAILED on hardware (PERFORMANCE.md r8 s14,
    # two interleaved A/Bs): fine light buckets LOST 3.3 ms/window
    # (every extra class entry costs ~1 ms fixed device time) and
    # coarse {4,8,12} buckets were a pace WASH — small classes are
    # fixed-cost-dominated, so "device compute ~linear in lanes" does
    # not extend to them.  Kept as a measured, tested experiment
    # surface for workloads with different class mixes.  0 disables.
    light_chunk_size: int = 0
    # Fine (non-pow2) chunk-count buckets for the fused shape classes:
    # adds NC in {2, 3, 6, 12, 24} to the pow2 ladder, so e.g. the dominant
    # 3-single-chunk-term query class stops padding 33% of its gather,
    # merge network, and top-k work up to NC=4.  The odd-even merge runs on
    # a virtual pow2 lane space with a phantom +inf tail — exact, same
    # comparator network restricted to the real lanes (ops/pallas_merge).
    fine_nc_buckets: bool = True
    # Split each shape class's query rows into greedy power-of-two
    # sub-dispatches (2048+512+pad(78) instead of one pow2 pad to 4096)
    # inside the same fused window program.  Device compute is ~linear in
    # rows x lanes, and pow2 padding of partially-filled classes wasted
    # ~10% of the bench window's device work (r5 host analysis: padded
    # chunk-eff 0.66 -> 0.73).  Sub-dispatch shapes stay inside the same
    # pow2 ladder, so no new kernel shapes — only new window compositions.
    pow2_row_split: bool = True
    # Fuse all shape classes of a query window into one jitted dispatch with
    # one packed input buffer and one packed result fetch (single device
    # round trip + single transfer pair per window).  Compiles once per
    # window composition; the persistent compile cache makes that a
    # first-run cost.  See index/device.py `_window_step_impl`.
    single_dispatch_windows: bool = True
    # Dispatch each shape class as its OWN device program (shared across
    # every window composition — jit-keyed on the class shape alone) plus
    # one tiny per-composition pack program, instead of composing the whole
    # window into one jitted program.  Same single packed H2D buffer and
    # single packed D2H drain; executions serialize on the device either
    # way.  Bounds the compile-variant explosion: a drifting workload
    # compiles O(distinct class shapes) expensive programs instead of
    # O(window compositions), and the pack step (trim + byte-pack + concat)
    # compiles in seconds, not the 30-120 s a full window composition costs
    # on this platform's remote compiler.  Takes precedence over
    # single_dispatch_windows when set.
    per_class_dispatch: bool = False
    # Freeze the window's shape-class composition into a reusable TEMPLATE
    # the first time a (scorer, k, fmt) stream is seen: each non-range
    # class gets a fixed row capacity (first window's count x
    # template_headroom, ceil-8) and every later window reuses the SAME
    # jitted window program — queries that overflow a class's capacity
    # spill into the next larger class (their extra chunk slots are dead
    # padding: zero jobs, DMA-skipped), and only a window that overflows
    # the whole template re-freezes it (ONE new compile instead of one
    # per composition).  Bounds the compile-variant explosion the same
    # way per_class_dispatch does but keeps the composed window's lower
    # dispatch count — and merges each class's pow2 row-split spans into
    # one exact-height dispatch (the per-dispatch fixed device cost was
    # ~1 ms on hardware, r7 session 1c).  Windows containing term-range
    # jobs fall back to the per-composition path (rare).
    # DEFAULT ON since r7 session 3 (hardware A/B, PERFORMANCE.md): slots
    # bit-equal to composed, serving QPS a wash-to-slight-win, and fresh
    # query mixes cost 0.1-0.3 s instead of a 30-120 s composition compile.
    template_compositions: bool = True
    # Row-capacity headroom factor when freezing a composition template.
    template_headroom: float = 1.15
    # --- serving-loop shape ------------------------------------------------
    # Sub-window size for the BLOCKING convenience path
    # (DeviceIndex.query_batch): batches larger than this are split into
    # serving_window-sized windows submitted as a pipeline of depth
    # serving_depth (plan/pack of window i+1 overlaps device compute of
    # window i; results are identical — queries are independent).  0 =
    # never split.  The async path (query_batch_async) is untouched:
    # latency-sensitive servers own their window size and drain cadence;
    # the measured QPS-vs-p50/p99 curve lives in PERFORMANCE.md (r7
    # latency sweep) and the `low_latency()` preset encodes its knee.
    serving_window: int = 0
    serving_depth: int = 4

    @classmethod
    def low_latency(cls, **kw) -> "IndexConfig":
        """Preset for latency-sensitive serving.

        Encodes the knee of the measured QPS-vs-latency curve on the
        1M-doc bench workload (PERFORMANCE.md r7 session 6): 2048-query
        windows at pipeline depth 4 measured p50 39.7 ms / p99 63.6 ms at
        157.6k QPS (vs p50 ~159 ms at the 16384-window throughput shape).
        Depth 6 trades p50 46.3 ms for 206.7k QPS; depth 1 is the fully
        synchronous floor (p50 36.7 ms, 48k QPS).
        """
        kw.setdefault("serving_window", 2048)
        kw.setdefault("serving_depth", 4)
        return cls(**kw)

    # Policy when a device-path query degrades to HOST-speed serving
    # (cap-exceeding plans; z2o shared-node queries past the ~16k-lane
    # lockstep compile cap).  Host fallbacks are exact but slow — the
    # measured z2o adversarial worst case (duplicate-term hot-prefix
    # queries, benchmarks/z2o_adversarial.py) serves at 28 QPS vs 18.6k
    # for a same-size normal window (664x, PERFORMANCE.md r8 session 3).
    #   "allow"  serve them silently (the default; matches the reference,
    #            which has no device path and no caps)
    #   "warn"   serve them and emit a RuntimeWarning with the count
    #   "error"  raise probly_search_tpu.HostFallbackError instead —
    #            for servers that would rather shed an adversarial query
    #            than absorb a ~35 ms/query host walk on the serving path
    host_fallback: str = "allow"

    # Issue `copy_to_host_async()` on the packed window result at submit
    # time.  The runtime enqueues the D2H transfer right behind the
    # window's execution, so it streams while the device crunches LATER
    # windows and the drain's blocking read finds the host copy done
    # (~0.1 ms) instead of paying the tunnel's sync+fetch round trip
    # (~37 ms) on the serving critical path.  Measured (r6 session 2,
    # PERFORMANCE.md): prefetched read 0.1 ms vs 36.9; steady-state
    # serving 240.2k -> 277.1k QPS with paired drains.  Issue cost is
    # ~0.5 ms per window; no effect on results (the read joins the same
    # buffer).  Drain one window LATE (read window i after submitting
    # i+2) to guarantee the copy has fully streamed before the read.
    prefetch_results: bool = True
