"""BatchAligner: bucketed many-pair alignment on TPU.

The TPU-native replacement for the reference's host pair loops
(/root/reference/rust/sequence_alignment/src/main.rs:35-44,
/root/reference/rust/sa_opencl/src/main.rs:298-315): pairs are grouped into
(npad, mpad) length buckets (so XLA compiles a handful of static programs),
padded into TB-pair tiles, filled on device in one fused program per bucket,
and walked/reconstructed on host.  Results come back in input order and are
bit-identical to the single-pair ``Aligner``.

Backends:
  * ``pallas``            — the Pallas TPU kernel (default on TPU)
  * ``pallas_interpret``  — same kernel, interpreter mode (CPU tests)
  * ``scan``              — vmapped lax.scan path (any backend; default off-TPU)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .aligner import (
    AlignResult,
    _as_seqdata,
    _perl_compat_seq,
    degenerate_result,
    reconstruct_alignment,
)
from .config import LOCAL, AlignConfig, CELL_MATCH, bucket_len
from .matrices import ScoringMatrix, SubstitutionMatrix
from .ops import batch as batch_ops
from .ops import device_walk
from .ops import traceback



def _copy_async(arr) -> None:
    try:
        arr.copy_to_host_async()
    except (AttributeError, RuntimeError):  # non-jax arrays / cpu backend
        pass


def _host_fetchables(pend):
    """Yield (setter, device_array) for every fetchable piece of a
    dispatched bucket, so all buckets' device->host transfers can run as
    ONE batched jax.device_get: per-array np.asarray syncs serialize a
    round trip each (~3.7x slower on remote devices, measured)."""
    kind = pend.get("kind")
    if kind in ("device_walk", "device_walk_sharded"):
        for key in ("stats_d", "idx_d"):
            yield (lambda h, _p=pend, _k=key: _p.__setitem__(_k, h),
                   pend[key])
    elif kind in ("device_walk_packed", "device_walk_packed_sharded"):
        for key in ("stats_d", "cnt_d", "mv_d"):
            yield (lambda h, _p=pend, _k=key: _p.__setitem__(_k, h),
                   pend[key])
    elif kind in ("pool_chunk", "stats_only"):
        yield (lambda h, _p=pend: _p.__setitem__("stats_d", h),
               _chunk_stats(pend))
    elif kind == "pool_bundle":
        for key in ("cnt_d", "mv_d"):
            yield (lambda h, _p=pend, _k=key: _p.__setitem__(_k, h),
                   pend[key])
    elif kind == "pallas_async":
        pf = pend["pf"]
        yield (lambda h, _pf=pf: setattr(_pf, "stats_dev", h), pf.stats_dev)
        for i, p in enumerate(pf.pieces or ()):
            yield (lambda h, _l=pf.pieces, _i=i: _l.__setitem__(_i, h), p)
    elif kind == "multi":
        for _, part in pend["parts"]:
            yield from _host_fetchables(part)


def _chunk_stats(pend):
    """Device stats of a pooled-fill chunk.  _dispatch_bucket flattens
    single-chunk pend dicts with update() BEFORE the fill flush runs, so
    flush-time results land in the shared mutable ``ref`` dict and the
    flattened copy's own ``stats_d`` stays None until the host gather
    writes the fetched array back into it."""
    s = pend.get("stats_d")
    return s if s is not None else pend["ref"]["stats_d"]


def _gather_host(pending) -> None:
    """Fetch every bucket's results to host in one batched transfer,
    writing numpy arrays back into the pend structures (the finish
    phase's np.asarray calls then cost nothing)."""
    setters, arrs = [], []
    for _, pend in pending:
        for setter, arr in _host_fetchables(pend):
            setters.append(setter)
            arrs.append(arr)
            _copy_async(arr)  # start the copy; device_get then overlaps
    if not arrs:
        return
    for setter, h in zip(setters, jax.device_get(arrs)):
        setter(h)


# largest pointer array the device walk may gather from: walk_bundle's
# flat index arithmetic is int32, so one walk's tb must stay < 2^31
# elements or the gather silently wraps (corrupt paths, no error)
_WALK_MAX_TB = (1 << 31) - 1


def _decode_sharded_part(part, Bp_total: int, count: int):
    """Decode one device_walk_sharded pend/part: per-shard stats/idx
    (leading D axis) -> (stats (Bp_total, 8), idx list for the first
    ``count`` pairs).  Shard-major row order == pair order."""
    stats_sh = np.asarray(part["stats_d"])  # (D, Bp, 8)
    idx_sh = np.asarray(part["idx_d"])      # (D, 2, L, Bp)
    D = stats_sh.shape[0]
    Bp = Bp_total // D
    stats_parts, idx = [], []
    for d in range(D):
        st, o1, o2 = device_walk.decode_bundle(stats_sh[d], idx_sh[d])
        stats_parts.append(st)
        remaining = count - d * Bp
        idx.extend(
            device_walk.pair_path(o1, o2, k)
            for k in range(max(0, min(Bp, remaining)))
        )
    return np.concatenate(stats_parts, axis=0), idx


def _pow2_chunks(G: int, cap: int = 8) -> List[int]:
    """Split G tile groups into power-of-two chunk sizes <= cap (largest
    first), so kernel programs (shape-specialized on G) are reused across
    arbitrary batch sizes: at most log2(cap)+1 programs per bucket."""
    out: List[int] = []
    c = cap
    while G:
        while c > G:
            c //= 2
        out.append(c)
        G -= c
    return out


def default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "scan"


@dataclass
class _Bucket:
    np_pad: int
    mp_pad: int
    indices: List[int]          # positions in the caller's pair list
    codes1: List[np.ndarray]
    codes2: List[np.ndarray]


class BatchAligner:
    def __init__(
        self,
        scoring_matrix: Optional[ScoringMatrix] = None,
        gap_open: float = 10.0,
        gap_extend: float = 0.5,
        mode: int = LOCAL,
        config: Optional[AlignConfig] = None,
        backend: Optional[str] = None,
        device_axis=None,
        tile_pairs: Optional[int] = None,
        longseq_cells: Optional[int] = None,
        diag_scores: Optional[bool] = None,
        device_walk: Optional[bool] = None,
        perl_compat: bool = False,
    ):
        if config is None:
            config = AlignConfig(mode=mode, gap_open=gap_open, gap_extend=gap_extend)
        self.config = config
        self.scoring_matrix = scoring_matrix or SubstitutionMatrix.blosum62()
        self.backend = backend or default_backend()
        # replicate the Perl engine's input rewrite (aligner.perl_sanitize)
        self.perl_compat = perl_compat
        self.device_axis = device_axis  # parallel.DataParallel or None
        self.tile_pairs = tile_pairs
        # buckets with >= this many padded cells use the checkpointed-fill +
        # banded-traceback path (ops/longseq.py).  None = auto: under the
        # device walk, longseq only engages past the pointer-HBM budget
        # (the host-transfer cost it was built to dodge is gone); an
        # explicit value forces the cell threshold regardless.
        self.longseq_cells = longseq_cells
        # wavefront (anti-diagonal) kernel for LOCAL score-only buckets
        # (ops/diag_dp.py); None -> SWTPU_DIAG_SCORES env (default off until
        # the TPU decision measurement lands)
        if diag_scores is None:
            diag_scores = os.environ.get("SWTPU_DIAG_SCORES", "0") == "1"
        self.diag_scores = diag_scores
        # on-device traceback walk (ops/device_walk.py): pointers stay on
        # device; only O(n+m) path indices transfer.  Default ON for the
        # plain pallas paths (the host walk + full-matrix D2H remains for
        # device_axis and as the SWTPU_DEVICE_WALK=0 fallback).
        if device_walk is None:
            device_walk = os.environ.get("SWTPU_DEVICE_WALK", "1") == "1"
        self.device_walk = device_walk
        # packed move-stream walk (device_walk.walk_bundle_packed +
        # csrc/reconstruct.cpp bulk string rebuild): 2 bits/step D2H and no
        # per-residue Python.  Default ON; SWTPU_PACKED_WALK=0 restores the
        # index-row bundle for A/B.
        self.packed_walk = os.environ.get("SWTPU_PACKED_WALK", "1") == "1"
        # pooled walk: all buckets'/chunks' walks run in ONE lockstep
        # while_loop (device_walk.walk_bundle_pooled) — per-step cost is
        # B-independent, so pooling pays max-path-length iterations
        # instead of sum-over-chunks.  SWTPU_POOLED_WALK=0 restores
        # per-chunk walks.
        self.pooled_walk = os.environ.get("SWTPU_POOLED_WALK", "1") == "1"
        # pooled fill: ALL staged chunks' score+fill programs trace into
        # ONE dispatched jit (ops/batch.fill_many) — the fill-side
        # analogue of the pooled walk.  SWTPU_POOLED_FILL=0 restores
        # per-chunk fill_from_codes dispatches for A/B.
        self.pooled_fill = os.environ.get("SWTPU_POOLED_FILL", "1") == "1"
        # token walks: the fill additionally emits per-cell match-run
        # bytes (pallas_dp emit_runs) and the pooled walk jumps up to 16
        # diagonal steps per serial iteration, emitting (state, runlen)
        # tokens the rebuild expands.  Requires the pooled fill+walk
        # path; costs a second pointer-sized device array per chunk and
        # a 4x larger walk-bundle D2H (1 byte/token vs 2 bits/move).
        # Default OFF: on this environment's ~25-45 MB/s tunnel the
        # extra transfer outweighs the saved serial iterations in every
        # paired A/B rep (MEASUREMENTS_r05.md §8); on PCIe-attached TPU
        # hosts the tradeoff reverses — flip SWTPU_TOKEN_WALK=1 there.
        self.token_walk = (
            os.environ.get("SWTPU_TOKEN_WALK", "0") == "1"
            and self.pooled_fill
        )
        # per-run pooled-fill staging (see _stage_fill/_flush_fills)
        self._fill_stage: List[dict] = []
        self._fill_stage_tb = 0
        # per-run pooled-walk state (see _pool_add/_flush_pool), keyed by
        # path-length class: done pairs still pay gather volume every
        # step, so short-path chunks must not ride a long chunk's pool
        self._pool_chunks: Dict[int, List[tuple]] = {}
        self._pool_bytes: Dict[int, int] = {}
        self._pools: List[dict] = []
        # HBM budget for resident pointer matrices (device-walk route).
        # This bounds the GLOBAL sum of staged/live pointer chunks (a
        # budget's worth of fills flush together with the walks that
        # consume them — ADVICE r4: per-class-only accounting let
        # n_classes x budget accumulate); single chunks and single walk
        # pools are additionally capped at the walk's int32 gather limit
        # (_WALK_MAX_TB).  Beyond the per-chunk cap, buckets fall back to
        # longseq checkpoint+refill.
        self.tb_hbm_bytes = int(
            os.environ.get("SWTPU_TB_HBM_BYTES", str(4 << 30))
        )
        # opt-in observability: assign a utils.metrics.StatsCollector
        self.stats = None
        # pointer arrays dispatched but possibly not yet walked: list of
        # (bytes, bundle-array to block on).  Bounds the SUM of concurrent
        # tb allocations across chunks/buckets (see _bound_tb_inflight).
        self._tb_inflight: List[Tuple[int, object]] = []
        self._tb_inflight_bytes = 0
        # wall-time phase breakdown of the last _run call (seconds):
        # bucket / dispatch / gather / decode / reconstruct.  Always on —
        # a handful of time.time() calls per bucket, not per pair.
        self.phase: Dict[str, float] = {}
        self._table_is_int = batch_ops.is_integer_table(
            np.asarray(self.scoring_matrix.table, np.float32)
        ) if hasattr(self.scoring_matrix, "table") else False

    @property
    def mode(self) -> int:
        return self.config.mode

    # ------------------------------------------------------------------
    def align_pairs(
        self, pairs: Sequence[Tuple], retain_all: bool = True
    ) -> List[AlignResult]:
        return self._run(pairs, retain_all=retain_all, score_only=False)

    def score_pairs(self, pairs: Sequence[Tuple]) -> np.ndarray:
        res = self._run(pairs, retain_all=True, score_only=True)
        return np.asarray([r.score for r in res], dtype=np.float32)

    # ------------------------------------------------------------------
    def _run(
        self, pairs: Sequence[Tuple], retain_all: bool, score_only: bool
    ) -> List[AlignResult]:
        import time as _time

        sm = self.scoring_matrix
        if not hasattr(sm, "table"):
            raise ValueError(
                "BatchAligner needs a letter-indexed scoring matrix; "
                "position-specific matrices are per-pair — use Aligner"
            )
        ph = self.phase = {
            "bucket": 0.0, "dispatch": 0.0, "gather": 0.0,
            "decode": 0.0, "reconstruct": 0.0,
        }
        t_run0 = _time.time()
        t0 = _time.time()
        og, eg = self.config.og, self.config.eg
        results: List[Optional[AlignResult]] = [None] * len(pairs)
        seqs: List[Tuple] = []
        buckets: Dict[Tuple[int, int], _Bucket] = {}

        for idx, (a, b) in enumerate(pairs):
            s1, s2 = _as_seqdata(a), _as_seqdata(b)
            if self.perl_compat:
                s1, s2 = _perl_compat_seq(s1), _perl_compat_seq(s2)
            seqs.append((s1, s2))
            c1 = sm.seq_to_index(s1.seq)
            c2 = sm.seq_to_index(s2.seq)
            if len(c1) == 0 or len(c2) == 0:
                results[idx] = degenerate_result(
                    s1.seq, s2.seq, self.mode, og, eg, retain_all, score_only
                )
                continue
            key = (
                bucket_len(len(c1), self.config.buckets),
                bucket_len(len(c2), self.config.buckets),
            )
            bk = buckets.get(key)
            if bk is None:
                bk = buckets[key] = _Bucket(key[0], key[1], [], [], [])
            bk.indices.append(idx)
            bk.codes1.append(c1)
            bk.codes2.append(c2)

        ph["bucket"] = _time.time() - t0
        # Two-phase pipeline: dispatch every bucket's device work first
        # (async under jax), then fetch + walk.  The reference suite is
        # latency/D2H-bound, not fill-bound — serializing dispatch with
        # fetch per bucket costs ~2x wall time (REFBENCH_r03.json).
        t0 = _time.time()
        self._tb_inflight.clear()
        self._tb_inflight_bytes = 0
        self._fill_stage = []
        self._fill_stage_tb = 0
        self._pool_chunks.clear()
        self._pool_bytes.clear()
        self._pools = []
        # deterministic bucket order: pooled-walk flush partitioning (and
        # therefore the pooled program's chunk composition, its jit cache
        # key) must not depend on input order, or every shuffled call of
        # the same workload re-traces multi-second programs
        pending = [
            (bk, self._dispatch_bucket(bk, score_only))
            for bk in sorted(
                buckets.values(), key=lambda b: (b.np_pad, b.mp_pad)
            )
        ]
        self._flush_fills()
        self._flush_pool()
        ph["dispatch"] = _time.time() - t0
        # fetch every bucket's results in ONE batched transfer before the
        # finish loop: per-bucket synchronous fetches cost a round trip
        # each and serialize without this (REFBENCH_r03)
        t0 = _time.time()
        _gather_host(pending + [(None, p) for p in self._pools])
        ph["gather"] = _time.time() - t0
        self._tb_inflight.clear()  # everything fetched; drop device refs
        self._tb_inflight_bytes = 0
        for bk, pend in pending:
            self._finish_bucket(bk, pend, seqs, results, retain_all,
                                score_only)
        self._pools = []
        if self.stats is not None:
            # non-overlapped engine wall: the denominator every
            # StatsCollector throughput number divides by
            self.stats.run_seconds += _time.time() - t_run0
        return results  # type: ignore[return-value]

    # ------------------------------------------------------------------
    def _bucket_tile(self, count: int, mp_pad: int) -> int:
        if self.tile_pairs is not None:
            return self.tile_pairs
        from .ops.pallas_dp import choose_tile

        return choose_tile(count, mp_pad)

    def _dispatch_bucket(self, bk, score_only):
        """Phase 1: pack codes, launch device work.  Returns a dict the
        finish phase consumes; device results are NOT forced to host here
        (except on paths that are host-synchronous by construction:
        longseq, scan, device_axis)."""
        import time as _time

        og, eg = self.config.og, self.config.eg
        count = len(bk.indices)
        if self.device_axis is not None:
            # size the tile for the PER-SHARD share: choose_tile(count)
            # times the mesh padded a 128-pair bucket to 1024 pairs on 8
            # devices — 8x padding work per shard (SCALING_r02's "per-
            # shard overhead" was mostly this)
            nd = self.device_axis.n_devices
            tile = self._bucket_tile(-(-count // nd), bk.mp_pad)
            step = tile * nd
        else:
            tile = self._bucket_tile(count, bk.mp_pad)
            step = tile
        B = -(-count // step) * step
        t_fill0 = _time.time()
        NP, MP = bk.np_pad, bk.mp_pad
        # int8 codes when the alphabet fits (every letter-indexed table;
        # K ~ 25): the codes upload is the dominant device-path cost at
        # suite scale on slow-H2D links — the 32x suite's ~19 MB of int32
        # codes took 0.42 s of its 0.63 s wall (fill_device_probe r5),
        # and the fills themselves are nearly free behind the transfer
        ctype = (np.int8
                 if np.asarray(self.scoring_matrix.table).shape[0] <= 127
                 else np.int32)
        codes1 = np.zeros((B, NP), ctype)
        codes2 = np.zeros((B, MP), ctype)
        n = np.ones(B, np.int32)
        m = np.ones(B, np.int32)

        def _pack(dst, codes, lens):
            # one fancy-index scatter instead of a per-pair row loop
            # (the loop was ~30-50 ms of the 3200-pair dispatch phase)
            total = int(lens.sum())
            if total == 0:
                return
            starts = np.zeros(count, np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            rows = np.repeat(np.arange(count), lens)
            cols = np.arange(total) - np.repeat(starts, lens)
            dst[rows, cols] = np.concatenate(codes)

        l1 = np.fromiter((len(c) for c in bk.codes1), np.int64, count)
        l2 = np.fromiter((len(c) for c in bk.codes2), np.int64, count)
        _pack(codes1, bk.codes1, l1)
        _pack(codes2, bk.codes2, l2)
        n[:count] = l1
        m[:count] = l2

        pend = {"n": n, "m": m, "B": B, "t0": t_fill0, "tile": tile}
        # Long-sequence routing.  With the on-device walk the pointer
        # matrix never crosses to the host, so the only reason to pay
        # checkpoint+refill (2x fill compute) is DEVICE memory: route to
        # longseq only when even ONE tile group's pointer array would blow
        # the HBM budget — batches whose TOTAL exceeds it are chunked over
        # pairs instead (see _dispatch_pallas: chunk size capped so each
        # dispatch fits, chunks serialized to bound peak HBM).  r3 routed
        # on the whole padded batch and sent e.g. 4096 pairs of 1024^2 to
        # checkpoint+refill at 0.11 GCUPS when chunked device walks run
        # ~10-20x faster (VERDICT r3 weak #3).  Without the device walk
        # (host-walk fallback) the old per-pair cell threshold applies —
        # there the cost being dodged is the O(n*m) D2H pointer transfer.
        tb_bytes = bk.np_pad * B * bk.mp_pad  # uint8 pointers
        if self.longseq_cells is not None:
            too_big = bk.np_pad * bk.mp_pad >= self.longseq_cells
        elif self.device_walk:
            # _WALK_MAX_TB caps the budget even if SWTPU_TB_HBM_BYTES is
            # raised: past it the walk's int32 gather index would wrap
            group_tb = bk.np_pad * tile * bk.mp_pad
            too_big = group_tb > min(self.tb_hbm_bytes, _WALK_MAX_TB)
        else:
            too_big = bk.np_pad * bk.mp_pad >= 8192 * 4096
        use_longseq = (
            self.backend in ("pallas", "pallas_interpret")
            and not score_only
            and self.device_axis is None
            and too_big
        )
        if use_longseq:
            from .ops import longseq

            S = self._scores(codes1, codes2, tile)
            if self.packed_walk:
                # device-side segment walks + packed move bundle: same
                # checkpoint+refill algorithm, but no per-segment host
                # round trips (VERDICT r3 weak #5)
                stats_d, cnt_d, mv_d = longseq.align_long_packed(
                    S, n, m, mode=self.mode, og=og, eg=eg,
                    interpret=self.backend == "pallas_interpret",
                )
                pend.update(kind="device_walk_packed", stats_d=stats_d,
                            cnt_d=cnt_d, mv_d=mv_d, Bp=B)
            else:
                idx_ready, stats = longseq.align_long(
                    S, n, m, mode=self.mode, og=og, eg=eg,
                    interpret=self.backend == "pallas_interpret",
                )
                pend.update(kind="longseq", idx_ready=idx_ready,
                            stats=stats)
        elif (
            self.backend in ("pallas", "pallas_interpret")
            and self.device_axis is None
        ):
            pend.update(self._dispatch_pallas(
                codes1, codes2, n, m, score_only, tile, count
            ))
        elif (
            self.backend in ("pallas", "pallas_interpret")
            and self.device_walk
            and not score_only
            # per-shard pointer array must stay gather-indexable (int32)
            and tb_bytes // self.device_axis.n_devices <= _WALK_MAX_TB
        ):
            # sharded fill + device walk: pointers stay on their shard,
            # one small bundle per device comes back.  Chunked into
            # power-of-two groups-per-shard units so compiled programs are
            # reused across batch sizes (same compile-storm fix as
            # _dispatch_pallas; shapes here carry a D*chunk leading axis).
            nd = self.device_axis.n_devices
            L = device_walk.max_path_len(codes1.shape[1], codes2.shape[1])
            Gs = codes1.shape[0] // (tile * nd)  # groups per shard
            parts = []
            g0 = 0
            for gc in _pow2_chunks(Gs, cap=8):
                lo, hi = g0 * tile * nd, (g0 + gc) * tile * nd
                cnt = max(0, min(count, hi) - lo)
                masked_s = self._masked_s(n[lo:hi], m[lo:hi])
                S = self._scores(
                    codes1[lo:hi], codes2[lo:hi], tile,
                    n=n[lo:hi] if masked_s else None,
                    m=m[lo:hi] if masked_s else None,
                )
                interp = self.backend == "pallas_interpret"
                if self.packed_walk:
                    stats_d, cnt_d, mv_d = (
                        self.device_axis.fill_walk_bundle_packed(
                            S, n[lo:hi], m[lo:hi], mode=self.mode,
                            og=og, eg=eg, L=L, interpret=interp,
                            masked_s=masked_s,
                        )
                    )
                    parts.append((cnt, {
                        "kind": "device_walk_packed_sharded",
                        "stats_d": stats_d, "cnt_d": cnt_d,
                        "mv_d": mv_d, "L": L, "Bp": hi - lo,
                    }))
                else:
                    stats_d, idx_d = self.device_axis.fill_walk_bundle(
                        S, n[lo:hi], m[lo:hi], mode=self.mode, og=og,
                        eg=eg, L=L, interpret=interp, masked_s=masked_s,
                    )
                    parts.append((cnt, {
                        "kind": "device_walk_sharded", "stats_d": stats_d,
                        "idx_d": idx_d, "L": L, "Bp": hi - lo,
                    }))
                g0 += gc
            if len(parts) == 1:
                pend.update(parts[0][1])
            else:
                pend.update(kind="multi", parts=parts)
        elif self.backend in ("pallas", "pallas_interpret"):
            tb_t, stats = self._fill_pallas(
                codes1, codes2, n, m, score_only, tile
            )
            pend.update(
                kind="ready", stats=stats, walk=traceback.walk_tiled,
                get_tb=lambda k: batch_ops.tb_pair_view(tb_t, k),
            )
        else:
            tb_t, stats = self._fill_scan(codes1, codes2, n, m, score_only)
            pend.update(
                kind="ready", stats=stats, walk=traceback.walk,
                get_tb=lambda k: tb_t[k],
            )
        return pend

    def _finish_bucket(self, bk, pend, seqs, results, retain_all, score_only):
        import time as _time

        count = len(bk.indices)
        n, m, B = pend["n"], pend["m"], pend["B"]
        idx_ready = pend.get("idx_ready")
        walk = pend.get("walk")
        get_tb = pend.get("get_tb")
        stats = pend.get("stats")
        t_dec0 = _time.time()
        _packed_kinds = ("device_walk_packed", "device_walk_packed_sharded",
                         "pool_chunk")
        if pend["kind"] in _packed_kinds or (
            pend["kind"] == "multi"
            and pend["parts"]
            and pend["parts"][0][1]["kind"] in _packed_kinds
        ):
            parts = (pend["parts"] if pend["kind"] == "multi"
                     else [(count, pend)])
            self._finish_packed(bk, pend, parts, seqs, results, retain_all)
            return
        if pend["kind"] == "stats_only":
            stats = np.asarray(pend["stats_d"]).reshape(-1, 8)
        elif pend["kind"] == "pallas_async":
            get_tb, stats = pend["pf"].fetch()
            walk = traceback.walk_tiled
        elif pend["kind"] == "device_walk":
            stats, o1, o2 = device_walk.decode_bundle(
                pend["stats_d"], pend["idx_d"]
            )
            idx_ready = [
                device_walk.pair_path(o1, o2, k) for k in range(count)
            ]
        elif pend["kind"] == "device_walk_sharded":
            stats, idx_ready = _decode_sharded_part(
                pend, pend.get("Bp", B), count
            )
        elif pend["kind"] == "multi":
            # power-of-two G chunks (see _dispatch_pallas): resolve each
            # part, then stitch per-pair views back together.  Chunks of
            # one bucket share every dispatch condition, so mixed kinds
            # can only mean a bug upstream — fail loudly rather than
            # stitch wrong pointers.
            kinds = {part["kind"] for _, part in pend["parts"]}
            assert len(kinds) == 1, f"mixed chunk kinds in bucket: {kinds}"
            stats_parts = []
            idx_parts: Optional[list] = []
            tb_parts = []
            for cnt, part in pend["parts"]:
                if part["kind"] == "device_walk":
                    st, o1, o2 = device_walk.decode_bundle(
                        part["stats_d"], part["idx_d"]
                    )
                    stats_parts.append(st[:cnt])
                    idx_parts.extend(
                        device_walk.pair_path(o1, o2, k)
                        for k in range(cnt)
                    )
                elif part["kind"] == "device_walk_sharded":
                    st, idx = _decode_sharded_part(part, part["Bp"], cnt)
                    stats_parts.append(st[:cnt])
                    idx_parts.extend(idx)
                elif part["kind"] == "stats_only":  # score-only chunks
                    stats_parts.append(
                        np.asarray(part["stats_d"]).reshape(-1, 8)[:cnt]
                    )
                    idx_parts = None
                else:  # pallas_async (score-only) / ready (host walk)
                    if part["kind"] == "ready":
                        gt, st = part["get_tb"], part["stats"]
                    else:
                        gt, st = part["pf"].fetch()
                    stats_parts.append(st[:cnt])
                    idx_parts = None
                    tb_parts.append((cnt, gt))
            stats = np.concatenate(stats_parts, axis=0)
            if idx_parts is not None:
                idx_ready = idx_parts
            elif any(gt is not None for _, gt in tb_parts):
                walk = traceback.walk_tiled
                offsets = np.cumsum([0] + [c for c, _ in tb_parts])

                def get_tb(k, _parts=tb_parts, _off=offsets):
                    p = int(np.searchsorted(_off, k, side="right")) - 1
                    return _parts[p][1](k - int(_off[p]))

        self.phase["decode"] += _time.time() - t_dec0
        t_fill = _time.time() - pend["t0"]
        if self.stats is not None:
            bs = self.stats.bucket(bk.np_pad, bk.mp_pad)
            bs.pairs += count
            bs.padded_pairs += B
            bs.true_cells += int(np.sum(n[:count].astype(np.int64) * m[:count]))
            bs.padded_cells += B * bk.np_pad * bk.mp_pad
            bs.inflight_seconds += t_fill

        t_walk0 = _time.time()
        for k in range(count):
            idx = bk.indices[k]
            s1, s2 = seqs[idx]
            nb, mb = int(n[k]), int(m[k])
            best, best_i, best_j = stats[k, 0], int(stats[k, 1]), int(stats[k, 2])
            if self.mode == LOCAL:
                score = float(best) if best > 0.0 else 0.0
            else:
                fin = stats[k, 3:6]
                state = int(np.argmax(fin))
                score = float(fin[state])
            if score_only:
                results[idx] = AlignResult("", "", score)
                continue
            if idx_ready is not None:
                idx1, idx2 = idx_ready[k]
            elif self.mode == LOCAL:
                if best <= 0.0:
                    idx1: List[int] = []
                    idx2: List[int] = []
                else:
                    idx1, idx2 = walk(get_tb(k), best_i, best_j, CELL_MATCH, True)
            else:
                idx1, idx2 = walk(get_tb(k), nb, mb, state, False)
            results[idx] = reconstruct_alignment(
                s1.seq, s2.seq, idx1, idx2, score, retain_all, self.mode
            )
        self.phase["reconstruct"] += _time.time() - t_walk0
        if self.stats is not None:
            self.stats.bucket(bk.np_pad, bk.mp_pad).walk_seconds += (
                _time.time() - t_walk0
            )

    def _reserve_tb(self, new_bytes: int) -> None:
        """Bound the SUM of live pointer arrays across async device-walk
        dispatches: before enqueueing a fill that allocates ``new_bytes``
        of pointers, block on the oldest outstanding walk bundles until
        the total fits the HBM budget.  Dispatch order is execution order
        on one device, so a ready bundle means its chunk's tb (the walk's
        only use of it) is dead.  r3 dispatched all buckets first with no
        bound — several buckets' tb arrays could coexist (VERDICT r3
        weak #3, second half)."""
        budget = min(self.tb_hbm_bytes, _WALK_MAX_TB)
        while self._tb_inflight and (
            self._tb_inflight_bytes + new_bytes > budget
        ):
            done_bytes, h = self._tb_inflight.pop(0)
            try:
                h.block_until_ready()
            except AttributeError:  # already a host array
                pass
            self._tb_inflight_bytes -= done_bytes

    def _track_tb(self, new_bytes: int, handle) -> None:
        self._tb_inflight.append((new_bytes, handle))
        self._tb_inflight_bytes += new_bytes

    def _stage_fill(self, codes1, codes2, n, m, tile, masked, score_only,
                    ref) -> None:
        """Register one chunk's score+fill for the pooled fill program
        (ops/batch.fill_many).  When the staged pointer bytes would pass
        the GLOBAL HBM budget, flush fills AND walks together: the walk
        programs consume the pointer arrays, so device execution order
        (fill #1, walks #1, fill #2, ...) bounds peak resident pointers
        at ~budget + the largest pool concat.

        Staging order is the canonical dispatch order (buckets sorted by
        shape, pow2 chunks largest-first), so the pooled program's cache
        key — the ordered chunk-shape composition — is workload-
        deterministic (same rule as the pooled walk; tested by
        tests/test_packed_walk.py's shuffled-workload case)."""
        tb_bytes = (0 if score_only
                    else codes1.shape[0] * codes1.shape[1] * codes2.shape[1])
        if self.token_walk:
            tb_bytes *= 2  # the match-run array doubles pointer bytes
        if self._fill_stage and (
            self._fill_stage_tb + tb_bytes > self.tb_hbm_bytes
        ):
            self._flush_fills()
            self._flush_pool()
        # ONE flat codes buffer per chunk, device_put NOW (async): each
        # tunnel transfer costs ~1.5 ms of round trip regardless of
        # size, so per-array uploads dominated fine-ladder small-batch
        # calls; starting the transfer at stage time overlaps it with
        # the host's remaining bucket/pack work (the single pooled
        # program can't pipeline uploads behind compute the way
        # per-chunk dispatches did)
        flat = np.concatenate([codes1.ravel(), codes2.ravel()])
        self._fill_stage.append(dict(
            flat=jax.device_put(flat),
            B=codes1.shape[0], NP=codes1.shape[1], MP=codes2.shape[1],
            n=n, m=m, tile=tile,
            masked=masked, score_only=score_only, ref=ref,
        ))
        self._fill_stage_tb += tb_bytes

    def _flush_fills(self) -> None:
        """Dispatch ONE fill_many program over the staged chunks; write
        each chunk's device stats into its pend and hand traceback
        chunks' pointer arrays to the pooled walk."""
        stage = self._fill_stage
        if not stage:
            return
        self._fill_stage = []
        self._fill_stage_tb = 0
        import jax.numpy as jnp

        table = np.asarray(self.scoring_matrix.table, np.float32)
        flats = tuple(st["flat"] for st in stage)
        # every chunk's lengths in ONE upload (per-chunk n/m transfers
        # were ~2/3 of a fine-ladder call's ~244 tunnel round trips)
        lens = jnp.asarray(np.concatenate(
            [np.concatenate([st["n"], st["m"]]) for st in stage]
        ), jnp.int32)
        metas = tuple(
            (st["B"], st["NP"], st["MP"], st["tile"], st["score_only"],
             st["masked"])
            for st in stage
        )
        outs = batch_ops.fill_many(
            jnp.asarray(table), flats, lens,
            as_int8=self._table_is_int, mode=self.mode,
            og=self.config.og, eg=self.config.eg,
            interpret=self.backend == "pallas_interpret", metas=metas,
            emit_runs=self.token_walk,
        )
        for st, (tb, run, stats) in zip(stage, outs):
            # through ref, not pend: single-chunk pends were flattened
            # into the bucket dict by update() before this flush ran
            st["ref"]["stats_d"] = stats
            if not st["score_only"]:
                self._pool_add(st["ref"], tb, run, stats, st["n"],
                               st["m"])

    def _pool_add(self, ref, tb, run, stats, n, m) -> None:
        """Register a fill's pointer chunk (and its match-run array,
        token walks) for the pooled walk in its path-length class; flush
        that class first when this chunk would bust the HBM budget (peak
        device memory: live chunks + the pool concat, each bounded by
        the budget).  The int32 gather limit applies to the tb pool and
        the run pool SEPARATELY (same flat size each), so the class
        budget keeps using tb bytes."""
        budget = min(self.tb_hbm_bytes, _WALK_MAX_TB)
        nbytes = int(np.prod(tb.shape))
        Lmax = device_walk.max_path_len(tb.shape[1], tb.shape[3])
        lc = 1 << (Lmax - 1).bit_length()  # pow2 path-length class
        if (self._pool_chunks.get(lc)
                and self._pool_bytes.get(lc, 0) + nbytes > budget):
            self._flush_class(lc)
        self._pool_chunks.setdefault(lc, []).append(
            (ref, tb, run, stats, np.asarray(n), np.asarray(m))
        )
        self._pool_bytes[lc] = self._pool_bytes.get(lc, 0) + nbytes

    def _flush_pool(self) -> None:
        for lc in sorted(self._pool_chunks):
            self._flush_class(lc)

    def _flush_class(self, L: int) -> None:
        """Dispatch ONE pooled walk over a length class's accumulated
        chunks; chunks' ref dicts receive their pool handle + column
        range."""
        chunks = self._pool_chunks.pop(L, None)
        self._pool_bytes.pop(L, None)
        if not chunks:
            return
        import jax.numpy as jnp

        # canonical composition order: the jit cache keys on the tuple of
        # chunk shapes IN ORDER, and bucket iteration follows input order
        # — without sorting, a shuffled batch of the same buckets
        # re-traces the whole pooled program every call (~2.8 s Python,
        # measured on the warm suite)
        chunks.sort(key=lambda c: c[1].shape)
        runs = tuple(c[2] for c in chunks)
        tokens = all(r is not None for r in runs)
        assert tokens or not any(r is not None for r in runs),             "mixed token/move chunks in one pool class"
        if tokens:
            cnt_d, mv_d = device_walk.walk_bundle_pooled_tokens(
                tuple(c[1] for c in chunks), runs,
                tuple(c[3] for c in chunks),
                tuple(jnp.asarray(c[4], jnp.int32) for c in chunks),
                tuple(jnp.asarray(c[5], jnp.int32) for c in chunks),
                mode=self.mode, L=L,
            )
        else:
            cnt_d, mv_d = device_walk.walk_bundle_pooled(
                tuple(c[1] for c in chunks),
                tuple(c[3] for c in chunks),
                tuple(jnp.asarray(c[4], jnp.int32) for c in chunks),
                tuple(jnp.asarray(c[5], jnp.int32) for c in chunks),
                mode=self.mode, L=L,
            )
        pool = {"kind": "pool_bundle", "cnt_d": cnt_d, "mv_d": mv_d,
                "tokens": tokens}
        c0 = 0
        for ref, tb, _, _, _, _ in chunks:
            B = tb.shape[0] * tb.shape[2]
            ref["pool"] = pool
            ref["col0"] = c0
            ref["Bc"] = B
            c0 += B
        self._pools.append(pool)

    def _finish_packed(self, bk, pend, parts, seqs, results, retain_all):
        """Finish a bucket whose walk came back as packed move streams:
        one bulk native string rebuild per chunk (ops/reconstruct.py), no
        per-residue Python."""
        import time as _time

        from .ops import reconstruct as recon

        t0 = _time.time()
        count = len(bk.indices)
        n, m = pend["n"], pend["m"]
        local = self.mode == LOCAL
        lo = 0
        for cnt, part in parts:
            if cnt == 0:
                continue
            mv_col0 = 0
            tokens = False  # move streams unless the pool says otherwise
            if part["kind"] == "device_walk_packed_sharded":
                # per-shard leading axis; shard-major row order == pair
                # order (cf. _decode_sharded_part)
                st = np.asarray(part["stats_d"]).reshape(-1, 8)[:cnt]
                cnt_arr = np.asarray(part["cnt_d"]).reshape(-1)
                mv_sh = np.asarray(part["mv_d"])  # (D, L4, Bp)
                mv = np.concatenate(list(mv_sh), axis=1)
            elif part["kind"] == "pool_chunk":
                ref = part["ref"]
                pool = ref["pool"]
                c0, Bc = ref["col0"], ref["Bc"]
                st = np.asarray(part["stats_d"]).reshape(-1, 8)[:cnt]
                cnt_arr = np.asarray(pool["cnt_d"])[c0:c0 + Bc]
                # full pooled array + column offset: a [:, c0:c0+Bc]
                # slice is non-contiguous and would copy per chunk
                mv = np.asarray(pool["mv_d"])
                mv_col0 = c0
                tokens = pool.get("tokens", False)
            else:
                assert part["kind"] == "device_walk_packed", part["kind"]
                st = np.asarray(part["stats_d"])[:cnt]
                cnt_arr = np.asarray(part["cnt_d"])
                mv = np.asarray(part["mv_d"])
            if local:
                scores = np.maximum(st[:, 0], 0.0)
                pos = st[:, 0] > 0.0
                i0 = np.where(pos, st[:, 1], 0).astype(np.int32)
                j0 = np.where(pos, st[:, 2], 0).astype(np.int32)
            else:
                scores = st[:, 3:6].max(axis=1)
                i0 = n[lo:lo + cnt].astype(np.int32)
                j0 = m[lo:lo + cnt].astype(np.int32)
            idxs = bk.indices[lo:lo + cnt]
            seq1s = [seqs[i][0].seq for i in idxs]
            seq2s = [seqs[i][1].seq for i in idxs]
            res = recon.reconstruct_packed(
                seq1s, seq2s, mv, cnt_arr, i0, j0, scores,
                self.mode, retain_all, col0=mv_col0, tokens=tokens,
            )
            for k, idx in enumerate(idxs):
                results[idx] = res[k]
            lo += cnt
        self.phase["reconstruct"] += _time.time() - t0
        if self.stats is not None:
            bs = self.stats.bucket(bk.np_pad, bk.mp_pad)
            bs.pairs += count
            bs.padded_pairs += pend["B"]
            bs.true_cells += int(
                np.sum(n[:count].astype(np.int64) * m[:count])
            )
            bs.padded_cells += pend["B"] * bk.np_pad * bk.mp_pad
            bs.inflight_seconds += t0 - pend["t0"]
            bs.walk_seconds += _time.time() - t0

    # ------------------------------------------------------------------
    def _scores(self, codes1, codes2, tile, n=None, m=None):
        table = np.asarray(self.scoring_matrix.table, np.float32)
        return batch_ops.scores_tiled(
            jax.numpy.asarray(table),
            codes1,
            codes2,
            as_int8=self._table_is_int,
            tile=tile,
            n=None if n is None else jax.numpy.asarray(n),
            m=None if m is None else jax.numpy.asarray(m),
        )

    def _masked_s(self, n, m) -> bool:
        """LOCAL: poison padded cells of S so the kernel can run its
        unmasked running-best fast path (see fill_tiled masked_s).  The
        argmax-position proof needs every pair non-empty; empty pairs
        fall back to the masked kernel.  (Single definition on purpose:
        the tie-break/argmax precondition is load-bearing for EMBOSS
        exactness and must not diverge between dispatch paths.)"""
        return self.mode == LOCAL and bool(
            np.all(np.asarray(n) >= 1) and np.all(np.asarray(m) >= 1)
        )

    def _fill_pallas(self, codes1, codes2, n, m, score_only, tile):
        masked_s = self._masked_s(n, m)
        S = self._scores(
            codes1, codes2, tile,
            n=n if masked_s else None, m=m if masked_s else None,
        )
        if self.diag_scores and score_only:
            from .ops import diag_dp

            if diag_dp.eligible(
                mode=self.mode, og=self.config.og, eg=self.config.eg,
                np_pad=codes1.shape[1], mp_pad=codes2.shape[1], tbp=tile,
                score_only=score_only, masked_s=masked_s,
            ):
                interp = self.backend == "pallas_interpret"
                if self.device_axis is not None:
                    stats = self.device_axis.fill_diag(
                        S, og=self.config.og, eg=self.config.eg,
                        interpret=interp,
                    )
                else:
                    stats = batch_ops.fill_diag(
                        S, og=self.config.og, eg=self.config.eg,
                        interpret=interp,
                    )
                return None, stats
        run = batch_ops.fill_pallas
        if self.device_axis is not None:
            run = self.device_axis.fill_pallas
        return run(
            S,
            n,
            m,
            mode=self.mode,
            og=self.config.og,
            eg=self.config.eg,
            score_only=score_only,
            interpret=self.backend == "pallas_interpret",
            masked_s=masked_s,
        )

    def _dispatch_pallas(self, codes1, codes2, n, m, score_only, tile,
                         count):
        """Dispatch-only pallas path (device_axis is None).

        Buckets wider than one tile group are split into power-of-two
        group chunks (8, 4, 2, 1): kernel programs are specialized on the
        leading G axis, so unchunked large batches compile a NEW program
        per distinct pair count — the 3200-pair suite spent 3 minutes
        compiling G=25 shapes it will never see again (REFBENCH_r03).
        Chunking bounds compiles at four programs per (bucket, mode) and
        streams arbitrary batch sizes through them; chunks dispatch
        back-to-back and stay async like everything else here.

        On the device-walk route the chunk cap is additionally sized so
        ONE chunk's pointer array fits the HBM budget, and chunks past the
        budget serialize (see _bound_tb_inflight) — so batches of any size
        stream through bounded HBM instead of falling off the longseq
        cliff (VERDICT r3 weak #3).
        """
        G = codes1.shape[0] // tile
        cap = 8
        if self.device_walk and not score_only:
            budget = min(self.tb_hbm_bytes, _WALK_MAX_TB)
            group_tb = codes1.shape[1] * tile * codes2.shape[1]
            while cap > 1 and cap * group_tb > budget:
                cap //= 2
        if G > 1:
            parts = []
            g0 = 0
            for gc in _pow2_chunks(G, cap=cap):
                lo, hi = g0 * tile, (g0 + gc) * tile
                cnt = max(0, min(count, hi) - lo)
                parts.append((cnt, self._dispatch_pallas_one(
                    codes1[lo:hi], codes2[lo:hi], n[lo:hi], m[lo:hi],
                    score_only, tile, cnt,
                )))
                g0 += gc
            return {"kind": "multi", "parts": parts}
        return self._dispatch_pallas_one(
            codes1, codes2, n, m, score_only, tile, count
        )

    def _dispatch_pallas_one(self, codes1, codes2, n, m, score_only, tile,
                             count):
        """Dispatch one G-chunk.  Returns the pend-dict fields: either a
        PendingFill transfer plan (score-only / host-walk fallback) or an
        on-device walk bundle (default for traceback: the pointer matrix
        never crosses to the host)."""
        import jax.numpy as jnp

        masked_s = self._masked_s(n, m)
        interp = self.backend == "pallas_interpret"
        if not score_only and self.device_walk and self.packed_walk \
                and self.pooled_walk:
            # pooled fast path: score compute + fill fused, and (default)
            # STAGED so every chunk's fill rides ONE dispatched program
            # (ops/batch.fill_many) — per-program execution overhead was
            # the 32x suite's dominant residual at ~26 bucket dispatches
            # (VERDICT r4 task 1).  The walk is deferred to the pooled
            # flush; its pool handle arrives later via the shared mutable
            # ``ref`` dict — _dispatch_bucket flattens pend dicts with
            # update(), so flush-time mutations of THIS dict would be
            # lost.  stats_d likewise lands at fill-flush time.
            ref: dict = {}
            pend = {"kind": "pool_chunk", "stats_d": None,
                    "Bp": codes1.shape[0], "ref": ref}
            if self.pooled_fill:
                self._stage_fill(codes1, codes2, n, m, tile, masked_s,
                                 False, ref)
                return pend
            table = np.asarray(self.scoring_matrix.table, np.float32)
            tb, stats = batch_ops.fill_from_codes(
                jnp.asarray(table), codes1, codes2,
                jnp.asarray(n, jnp.int32), jnp.asarray(m, jnp.int32),
                as_int8=self._table_is_int, tile=tile, mode=self.mode,
                og=self.config.og, eg=self.config.eg, score_only=False,
                interpret=interp, masked=masked_s,
            )
            pend["stats_d"] = stats
            self._pool_add(ref, tb, None, stats, n, m)
            return pend
        if (score_only and self.pooled_walk
                and not self.diag_scores
                and self.device_axis is None):
            # score-only: one fused dispatch; only the (B, 8) stats
            # block ever exists device-side.  Staged into the pooled
            # fill program by default (score-only chunks add no lasting
            # pointer bytes, so they never trigger a budget flush).
            if self.pooled_fill:
                ref_so: dict = {}
                pend = {"kind": "stats_only", "stats_d": None,
                        "ref": ref_so}
                self._stage_fill(codes1, codes2, n, m, tile, masked_s,
                                 True, ref_so)
                return pend
            table = np.asarray(self.scoring_matrix.table, np.float32)
            _, stats = batch_ops.fill_from_codes(
                jnp.asarray(table), codes1, codes2,
                jnp.asarray(n, jnp.int32), jnp.asarray(m, jnp.int32),
                as_int8=self._table_is_int, tile=tile, mode=self.mode,
                og=self.config.og, eg=self.config.eg, score_only=True,
                interpret=interp, masked=masked_s,
            )
            return {"kind": "stats_only", "stats_d": stats}
        S = self._scores(
            codes1, codes2, tile,
            n=n if masked_s else None, m=m if masked_s else None,
        )
        if self.diag_scores and score_only:
            from .ops import diag_dp

            if diag_dp.eligible(
                mode=self.mode, og=self.config.og, eg=self.config.eg,
                np_pad=codes1.shape[1], mp_pad=codes2.shape[1], tbp=tile,
                score_only=score_only, masked_s=masked_s,
            ):
                stats = batch_ops.fill_diag(
                    S, og=self.config.og, eg=self.config.eg, interpret=interp,
                )
                return {
                    "kind": "pallas_async",
                    "pf": batch_ops.PendingFill(
                        None, stats, tile, count, stats.shape[0]
                    ),
                }
        if not score_only and self.device_walk:
            tb_new = codes1.shape[0] * codes1.shape[1] * codes2.shape[1]
            self._reserve_tb(tb_new)
            tb, stats = batch_ops.fill_pallas_dev(
                S, n, m, mode=self.mode, og=self.config.og,
                eg=self.config.eg, score_only=False, interpret=interp,
                masked_s=masked_s,
            )
            L = device_walk.max_path_len(codes1.shape[1], codes2.shape[1])
            if self.packed_walk:
                stats_d, cnt_d, mv_d = device_walk.walk_bundle_packed(
                    tb, stats, jnp.asarray(n, jnp.int32),
                    jnp.asarray(m, jnp.int32), mode=self.mode, L=L,
                )
                self._track_tb(tb_new, stats_d)
                return {"kind": "device_walk_packed", "stats_d": stats_d,
                        "cnt_d": cnt_d, "mv_d": mv_d, "L": L,
                        "Bp": codes1.shape[0]}
            stats_d, idx_d = device_walk.walk_bundle(
                tb, stats, jnp.asarray(n, jnp.int32),
                jnp.asarray(m, jnp.int32), mode=self.mode, L=L,
            )
            self._track_tb(tb_new, stats_d)
            return {"kind": "device_walk", "stats_d": stats_d,
                    "idx_d": idx_d, "L": L, "Bp": codes1.shape[0]}
        pf = batch_ops.fill_pallas_async(
            S, n, m, mode=self.mode, og=self.config.og, eg=self.config.eg,
            count=count, score_only=score_only, interpret=interp,
            masked_s=masked_s,
        )
        if pf.pieces is not None and not self.device_walk:
            # host-walk fallback: fetch NOW so this bucket's pointer
            # buffers free before the next bucket fills — keeping every
            # bucket's full tb alive through the dispatch phase would
            # regress peak HBM vs the old serial per-bucket flow
            get_tb, stats = pf.fetch()
            return {"kind": "ready", "stats": stats,
                    "walk": traceback.walk_tiled, "get_tb": get_tb}
        return {"kind": "pallas_async", "pf": pf}

    def _fill_scan(self, codes1, codes2, n, m, score_only):
        """vmapped scan fallback; returns (tb (B, NP+1, MP+1), stats (B, 8))."""
        table = np.asarray(self.scoring_matrix.table, np.float32)
        B = codes1.shape[0]
        S = table[codes1[:, :, None], codes2[:, None, :]].astype(np.float32)
        res = batch_ops.fill_scan(
            S, n, m, mode=self.mode, og=self.config.og, eg=self.config.eg,
            score_only=score_only,
        )
        stats = np.zeros((B, 8), np.float32)
        stats[:, 0] = np.asarray(res.best)
        stats[:, 1] = np.asarray(res.best_i)
        stats[:, 2] = np.asarray(res.best_j)
        stats[:, 3:6] = np.asarray(res.final)
        tb = np.asarray(res.tb) if not score_only else None
        return tb, stats
