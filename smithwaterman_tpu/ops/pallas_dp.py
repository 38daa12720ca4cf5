"""Pallas TPU fill kernel: batched 3-state affine-gap DP.

TPU-native replacement for the reference's OpenCL wavefront kernel
(/root/reference/rust/sa_opencl/src/opencl_sequence_alignment.rs:324-542).
Where the reference parallelizes *within* one DP matrix (one work-item per
column, spin-waiting on neighbor flags), this kernel parallelizes *across*
pairs and vectorizes *within* each row:

  * A grid step owns a tile of ``TBP`` pairs (a multiple of the 8 VPU
    sublanes; default 128), laid out on the sublane axis; the j axis
    (columns, length ``MP``) rides the 128-lane axis.  Wide tiles matter:
    the row loop is a serial dependence chain, so per-op width is what
    hides VPU instruction latency.
  * Rows are filled sequentially (the true data dependence).  The only
    intra-row dependence — the gap-in-seq1 state ``X[j] = max(G[j-1],
    X[j-1]+pe)`` — is a max-plus prefix scan, computed with a
    Hillis-Steele cummax over lanes (exact in f32: all scores are
    half-integers).  No spinlocks, no racy flags: dependencies live in the
    loop structure, which is the idiomatic TPU answer to the reference's
    flag-polling wavefront.
  * Substitution scores are precomputed outside the kernel (one-hot matmul
    on the MXU / gather, see ``ops/batch.py``) and streamed as int8 (or f32
    for non-integer matrices), 1 byte per cell of HBM traffic.
  * Per-cell traceback pointers (2 bits x 3 states, packed uint8, same
    packing idea as the reference's flag matrix, opencl:512) stream back to
    HBM; the O(n+m) pointer walk runs on host, mirroring the reference GPU
    engine's host-side backtrack split (opencl:765-795).
  * The per-column best/argmax tracking mirrors opencl:507-524 but in
    registers: a running (pair, lane) max with first-row-wins tie rule,
    reduced at the last row block with the exact i-major/j-minor
    first-encounter rule of the reference (sequence_alignment.rs:282-295).

Cell semantics are bit-identical to ``ops/scan_dp.fill`` (which is itself
validated string-exact against all 300 EMBOSS golden fixtures); equivalence
is enforced by tests/test_pallas_kernel.py.

Layout: callers pass S (and receive tb) as ``(G, NP, TBP, MP)`` where
``B = G*TBP`` pairs — each row slab ``(TBP, MP)`` is then a native
(sublane, lane) tile, so the row loop never re-lays-out data.

Performance notes (measured honestly in r2 — chained execution + forced
device->host value reads; the axon tunnel caches identical executions AND
returns early from block_until_ready, which contaminated the r1 ablation
notes.  v5e, 512 pairs of 512x512, tile=128):

  * LOCAL ~33.4 GCUPS with traceback, ~44 score-only after the r2 changes
    (fused max3 shift, LOCAL h0-fold elimination, ptrfast packed pointer
    cascades, detrended X-scan input on BOTH paths, xscan X pointers read
    straight off the scan, R=8 row groups, finals_gate block
    specialization for non-LOCAL — shape-gated: single-group traceback
    blocks run ungated, see _use_finals_gate; r1 shipped 21.8 with
    traceback).
    Non-LOCAL: ~34 traceback / ~39 score-only in both global and glocal.
  * The kernel is ISSUE-BOUND at ~1 vector op/cycle: per-row wide-op count
    x 64 vreg-issues/op x rows matches wall time within ~5%.  Op-count
    reduction is the only lever; nothing else moved the needle
    (f32-vs-int8 S: -2%; mask removal: 0; dual chains: negative; tile
    64/256: negative/flat; bigger row blocks: flat; R=16/32 post-xscan:
    regress/flat).
  * The 9-step lane cummax for the X state is the single largest cost
    and the exactness-mandated floor: Hillis-Steele over 512 lanes is 18
    of the ~28 wide ops per row.  Score-only now sits AT the zero-cost-
    scan ablation ceiling measured pre-detrend (44.6 GCUPS) — further
    gains need a cheaper exact scan, not micro-tuning.
  * int16 x2-score-domain (halves vreg issues) is BLOCKED by the current
    Mosaic toolchain: vector<8x128x2xi16> arith.maxsi fails to legalize
    (scripts/kernel_lab.py 'i16' variants keep the experiment).
  * Traceback adds only ~12% over score-only (pointer cascades co-
    schedule well); the tb byte stream is noise (134 MB @ 819 GB/s).

All lab variants and the honest-timing harness live in
scripts/kernel_lab.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import CELL_STOP, GLOBAL, GLOCAL, LOCAL

TB = 8   # minimum tile granularity (VPU sublane count)
# largest in-register row group (see R selection in _kernel); env-tunable
# so perf A/B runs need no source edit — A/B MUST use this env var in
# separate processes: mutating _MAX_R in-process does not invalidate
# jit caches of callers, so the old kernel gets re-timed.  R=8 measured
# best on both paths pre-xscan (kernel_lab R8/R16 variants, separate
# jits); post-xscan re-check pending a valid env-var A/B.
_MAX_R = int(os.environ.get("SWTPU_MAX_ROWGROUP", "8"))
# finals_gate block specialization for non-LOCAL fills (commit 060d551);
# env off-switch exists for perf A/Bs only (same separate-process rule)
_FINALS_GATE = os.environ.get("SWTPU_FINALS_GATE", "1") != "0"
# row-block VMEM budget; frozen at import like _MAX_R/_FINALS_GATE so an
# in-process env mutation cannot silently skew A/Bs via stale jit caches
_RB_BUDGET = int(os.environ.get("SWTPU_RB_BUDGET_KB", "1024")) << 10
DEFAULT_TILE_PAIRS = 128  # default pairs per grid step
NEG = -1.0e30  # large-negative fill; drift-safe (scores stay < ~1e6)
BIGI = 2**30  # "unset" argmax sentinel (python int: kernels must not capture tracers)

# stats lane layout (per pair): [best, best_i, best_j, finalM, finalX, finalY, 0, 0]
STATS_W = 8


def _row_block(np_pad: int, mp_pad: int, tbp: int, itemsize: int) -> int:
    """Rows per S/tb block so a block stays ~<=1 MiB (double-buffered DMA).

    The result always divides ``np_pad`` (beyond-ladder buckets are rounded
    to 256-multiples, not powers of two — config.bucket_len), so the grid
    covers every row; cf. the same guard in banded.fill_banded.

    ``SWTPU_RB_BUDGET_KB`` overrides the block budget for perf A/Bs
    (separate processes — frozen at import as _RB_BUDGET, same rule as
    _MAX_R above)."""
    budget = _RB_BUDGET
    rb = max(8, budget // max(1, tbp * mp_pad * itemsize))
    rb = 1 << (rb.bit_length() - 1)  # floor to power of two
    rb = min(rb, np_pad)
    while rb > 1 and np_pad % rb:
        rb //= 2
    if np_pad % rb:
        raise ValueError(f"np_pad {np_pad} is not a multiple of 8")
    return rb


def _use_finals_gate(mode: int, score_only: bool, rb_rows: int) -> bool:
    """Whether the non-LOCAL block specialization (finals gate, commit
    060d551) pays for this fill shape.  It pays except on traceback fills
    whose row block is a single register group (rb_rows == R): there the
    gate's two single-iteration branch bodies defeat DMA pipelining of
    the tb write-back — measured 20.2 vs 31.5 GCUPS at (tile=128,
    MP=1024, rb=8) glocal traceback, while the same shape score-only
    PREFERS the gate (43.1 vs 41.5) and multi-group traceback blocks do
    too (512^2 tb: 34.0 vs 33.0).  See MEASUREMENTS_r02.md
    "finals_gate shape rule"."""
    if os.environ.get("SWTPU_FINALS_GATE") == "force":  # A/B: ignore rule
        return mode != LOCAL
    return (
        mode != LOCAL
        and _FINALS_GATE
        and (score_only or rb_rows // _row_group(rb_rows) > 1)
    )


def _row_group(rb_rows: int) -> int:
    """In-register row-group size the kernel will use for an rb_rows
    block: the largest power of two <= _MAX_R dividing rb_rows."""
    r = 1
    for cand in (2, 4, 8, 16):
        if cand <= _MAX_R and rb_rows % cand == 0:
            r = cand
    return r


def choose_tile(count: int, mp_pad: int) -> int:
    """Pairs per tile: as wide as VMEM allows (wide tiles hide the row
    loop's VPU latency chain), no wider than the batch needs.

    The ladder extends past 128 for narrow buckets: per-op fixed issue
    cost is ~32 vregs' worth (r3 A/B), so a (128, 256) slab is issue-
    bound while (256, 256) matches the (128, 512) rate — tile=256 took
    the 256^2 bucket from 37.4 -> 46.5 GCUPS score-only (the r2 "small-
    bucket dip", VERDICT r2 #5)."""
    vmax = 8
    for t in (16, 32, 64, 128, 256, 512):
        # 5 f32 scratch rows per pair + headroom for S/tb blocks, and at
        # least 2 rows per S block under the _row_block budget
        if t * mp_pad * 4 * 5 <= (4 << 20):
            vmax = t
    need = -(-max(count, 1) // 8) * 8  # batch rounded up to sublane multiple
    tile = 8
    while tile < need and tile < vmax:
        tile *= 2
    return tile


def _shift_right(v, fill):
    pad = jnp.broadcast_to(fill, v.shape[:-1] + (1,)).astype(v.dtype)
    return jnp.concatenate([pad, v[:, :-1]], axis=1)


def _cummax_lanes(v, width: int):
    sh = 1
    while sh < width:
        shifted = jnp.concatenate(
            [jnp.full(v.shape[:-1] + (sh,), NEG, v.dtype), v[:, :-sh]], axis=1
        )
        v = jnp.maximum(v, shifted)
        sh *= 2
    return v


def _kernel(
    *refs,
    mode: int,
    og: float,
    eg: float,
    rb_rows: int,
    tbp: int,
    mp: int,
    n_row_blocks: int,
    score_only: bool,
    seeded: bool = False,
    ckpt: bool = False,
    masked_s: bool = False,
    finals_gate: bool = False,
    emit_runs: bool = False,
):
    """Ref layout (flag-dependent):
      inputs:  n (1,TBP,1), m (1,TBP,1),
               [finals_gate: finals (G, n_row_blocks) SMEM, full array],
               [seeded: i0 (1,1) SMEM, icm/icx/icy (1,TBP,MP)],
               S (1,RB,TBP,MP)
      outputs: [not score_only: tb (1,RB,TBP,MP)],
               [emit_runs: run (1,RB,TBP,MP)], stats (1,TBP,STATS_W),
               [ckpt: ckm/ckx/cky (1,1,TBP,MP)]
      scratch: cm, cx, cy, runbest, runbest_i, acc, [emit_runs: run carry]
    """
    it = iter(refs)
    n_ref = next(it)
    m_ref = next(it)
    finals_ref = next(it) if finals_gate else None
    if seeded:
        i0_ref = next(it)
        icm_ref = next(it)
        icx_ref = next(it)
        icy_ref = next(it)
    s_ref = next(it)
    tb_ref = None if score_only else next(it)
    run_ref = next(it) if emit_runs else None
    stats_ref = next(it)
    if ckpt:
        ckm_ref = next(it)
        ckx_ref = next(it)
        cky_ref = next(it)
    # scratch: slots 4-6 are mode-dependent (LOCAL: running best value,
    # best-row i32, stats acc; otherwise: the captured (M, X, Y) rows at
    # each pair's final row i == n); emit_runs appends a run-carry slot
    cm, cx, cy, s4, s5, s6, *s_extra = it
    runbest, runbest_i = s4, s5
    fM_s, fX_s, fY_s = s4, s5, s6
    run_c = s_extra[0] if emit_runs else None

    rb = pl.program_id(1)
    if mode == GLOBAL:
        so, se = og, eg
    else:
        so, se = 0.0, 0.0
    sent = 10.0 * og + 10.0 * eg
    # global row offset of this call's row 0 (band refills start mid-matrix)
    i0 = i0_ref[0, 0] if seeded else 0
    # local argmax (i, j) is needed whenever a traceback will follow — also
    # in the score-only checkpointed fill (ops/longseq.py walks from it)
    track_arg = (not score_only) or ckpt

    nvec = n_ref[0, :, :]            # (TBP, 1)
    mvec = m_ref[0, :, :]            # (TBP, 1)
    jl = jax.lax.broadcasted_iota(jnp.int32, (tbp, mp), 1)  # lane l <-> j = l+1
    jf1 = (jl + 1).astype(jnp.float32)
    lanef = jl.astype(jnp.float32)

    # column masks for glocal's free-last-column Y penalties (rs:169-170);
    # no-op for global (so == og) and unused for local.
    if mode == GLOCAL:
        last_col = jl + 1 == mvec
        qo = jnp.where(last_col, so, og)
        qe = jnp.where(last_col, se, eg)
    else:
        qo, qe = og, eg

    valid_j = jl < mvec  # lanes carrying real columns
    # loop-invariant pieces of the X prefix scan.  lanef_pe/povec use the
    # INTERIOR penalties (og, eg): exact for every row outside glocal's
    # free last row, so glocal "interior" row blocks (finals_gate blocks
    # with no pair's final row) share them too.
    lanef_pe = lanef * eg
    # detrend: fold the +og and the per-lane -l*eg detrend into ONE
    # loop-invariant vector added BEFORE the shift, so
    # shift(max + povec)[l] = max[l-1] + og - l*eg = h[l] exactly (all
    # quantities are dyadic/half-integers -> f32-exact in either
    # association).  Saves one wide op per row; measured +14% in the
    # lab (scripts/kernel_lab.py detrend variants).  Used on BOTH the
    # score-only and traceback paths (the xscan X pointer below reads
    # the compare off the scan, so hraw is never materialized); only
    # GLOCAL rows that may be a pair's last keep the raw path (pe
    # varies there).
    povec = og - lanef_pe - eg

    @pl.when(rb == 0)
    def _init():
        if seeded:
            # carries handed in from a checkpoint row (ops/longseq.py)
            cm[:, :] = icm_ref[0, :, :]
            cx[:, :] = icx_ref[0, :, :]
            cy[:, :] = icy_ref[0, :, :]
        else:
            # boundary row i == 0, j = 1..MP (rs:100-108)
            lsc = jf1 * se + (so - se)
            cm[:, :] = lsc + sent
            cx[:, :] = lsc
            cy[:, :] = lsc + sent
        if emit_runs:
            # row 0 boundary: capped fill (e=15, x=M) — see the run-byte
            # comment in one_row
            run_c[:, :] = jnp.full((tbp, mp), 15, jnp.int32)
        if mode == LOCAL:
            runbest[:, :] = jnp.full((tbp, mp), NEG, jnp.float32)
            if track_arg:
                runbest_i[:, :] = jnp.full((tbp, mp), BIGI, jnp.int32)
        else:
            z = jnp.zeros((tbp, mp), jnp.float32)
            fM_s[:, :] = z
            fX_s[:, :] = z
            fY_s[:, :] = z

    def one_row(r, Mp, Xp, Yp, rbv, rbi, accv, Rp=None, capture=True,
                interior=False):
        """One DP row entirely in registers: consumes the previous row's
        (M, X, Y) values, returns this row's — scratch is only touched at
        row-group boundaries (VMEM carry traffic was the kernel's main
        cost, ~half the runtime at tile=128).

        ``capture=False``/``interior=True`` is the specialized non-LOCAL
        variant for row blocks that contain NO pair's final row
        (finals_gate): the i == n capture is skipped (4 wide ops/row) and
        glocal's per-row last-row penalty switch collapses to the interior
        constants — identical values on such blocks by construction —
        which also re-enables the detrended score-only scan."""
        i = i0 + rb * rb_rows + r + 1  # 1-based global row
        fi = jnp.float32(i)
        srow = s_ref[0, r, :, :].astype(jnp.float32)

        # boundary values at (i-1, 0) / (i, 0) (rs:88-93,109-117)
        lsc_im1 = (fi - 1.0) * se + (so - se)
        lsc_i = fi * se + (so - se)
        # (0,0) is (0,-1,-1); (i-1>=1, 0) is (sent'd, sent'd, lsc) — the gap
        # chain down column 0 lives in the Y state (rs:109-117)
        at_first = i == 1
        fill_m = jnp.where(at_first, 0.0, lsc_im1 + sent)
        fill_x = jnp.where(at_first, -1.0, lsc_im1 + sent)
        fill_y = jnp.where(at_first, -1.0, lsc_im1)

        # ---- M: from (i-1, j-1); tie order M >= X >= Y (rs:139-158)
        # max3 is associative, so shift ONCE after the max instead of
        # shifting all three states (measured +11%; the boundary fill of
        # the fused shift is the max of the three per-state fills —
        # exactly what the three shifted lanes would produce at lane 0)
        U = jnp.maximum(Mp, Xp)
        W3 = jnp.maximum(U, Yp)
        fill_w = jnp.maximum(jnp.maximum(fill_m, fill_x), fill_y)
        val_m = _shift_right(W3, fill_w) + srow
        if not score_only:
            # ptrfast (r2, +29% on the traceback path): the 2-bit argmax
            # is computed PRE-shift and the packed result shifted once,
            # replacing three state shifts + cascade.  Bit-identical to
            # the per-state-shift cascade (same >= chains); lane 0
            # resolves to M at i==1 (fills 0/-1/-1) else to the cascade
            # on (lsc+sent, lsc+sent, lsc): Y for sent<0, M for sent==0.
            # (an equality-vs-W3 form with 2 fewer jnp ops measured SLOWER
            # in-process — kernel_lab tb-ptreq-R8-i8 23.9 vs 25.1; keep
            # the cascade)
            pm_pre = jnp.where(
                Mp >= Xp,
                jnp.where(Mp >= Yp, 0, 2),
                jnp.where(Xp >= Yp, 1, 2),
            )
            fill2 = 0 if sent >= 0.0 else 2
            fill_pm = jnp.where(
                jnp.broadcast_to(at_first, (tbp, 1)),
                jnp.zeros((tbp, 1), jnp.int32),
                jnp.full((tbp, 1), fill2, jnp.int32),
            )
            prev_m = _shift_right(pm_pre, fill_pm)

        # ---- Y: gap in seq2, from (i-1, j) (prev row, same j).
        # Values fold max(Mp+o, Xp+o) through the shared U = max(Mp, Xp);
        # the tie cascade (rs:233-252 LOCAL / rs:192-211 otherwise) picks
        # among equal maxima, so values-by-max is exact.
        if mode == LOCAL:
            Ue = U + og
            Ye = Yp + eg
        else:
            Ue = U + qo
            Ye = Yp + qe
        val_y = jnp.maximum(Ue, Ye)
        if not score_only:
            # ptrfast: Y-extend wins the cascade iff it beats BOTH opens,
            # whose max is exactly Ue; otherwise the M-vs-X tie decides.
            # The old c1 compare is redundant: in the not-Y branch, the
            # M-leg has Ue = Mp+o >= Ye (which IS c1) and the X-leg lands
            # on X-open through either side of c1.  LOCAL tie directions
            # (rs:233-252): `>=` favors M-open over Y-extend => Y needs
            # strict `>`; inner `>` favors M over X.  Non-LOCAL
            # (rs:192-211): strict `>` favors Y on ties => `>=` here, and
            # M-vs-X flips to `>=`.  Constants pre-shifted <<4 so the
            # final pack needs no shift ops.
            if mode == LOCAL:
                y_wins = Ye > Ue
                m_over_x = Mp > Xp
            else:
                y_wins = Ye >= Ue
                m_over_x = Mp >= Xp
            prev_y = jnp.where(y_wins, 32, jnp.where(m_over_x, 0, 16))

        if mode == LOCAL:
            val_m = jnp.maximum(val_m, 0.0)
            val_y = jnp.maximum(val_y, 0.0)

        # ---- X: gap in seq1, from (i, j-1) — max-plus prefix scan
        if mode == GLOCAL and not interior:
            # free gaps along the last row of seq1 (rs:166-167), per pair
            last_row = i == nvec  # (TBP, 1)
            po = jnp.where(last_row, so, og)
            pe = jnp.where(last_row, se, eg)
        else:
            po, pe = og, eg
        x0b = lsc_i + sent  # boundary X at (i, 0)
        g0 = lsc_i + po     # max(M,Y) at (i, 0) + po  (Y=lsc_i dominates)
        detrended = mode != GLOCAL or interior  # pe == eg on every row
        lpe = lanef_pe if detrended else lanef * pe
        if detrended:
            # detrended h in one add + one shift (see povec above); lane 0
            # gets the shift fill g0, identical to hraw[0] - 0*eg.  Used on
            # BOTH the score-only and traceback paths: the X pointer reads
            # straight off the scan (x_wins below), so hraw is never needed
            # when pe is the constant eg.
            h = _shift_right(jnp.maximum(val_m, val_y) + povec, g0)
        else:
            gline = jnp.maximum(val_m, val_y) + po
            hraw = _shift_right(gline, g0)
            h = hraw - lpe
        # Lane 0 already holds g0 (shift fill / lanef=0), and the h0 fold
        # h[0] <- max(g0, x0b + pe) is a no-op for the VALUE path in every
        # mode: x0b + pe - g0 = sent + pe - po, which is 9*og + 11*eg in
        # LOCAL/GLOBAL/GLOCAL-interior and sent on a glocal free last row
        # — never positive for the non-positive internal penalties the
        # config admits, and on equality (degenerate og=eg=0) the max is
        # the same value anyway.  The traceback lane-0 tie direction is
        # handled independently by the x_wins/fill_my shift fills below.
        # (r2: skipping the fold saves 2 wide ops/row; LOCAL skipped it
        # first, the proof above extends it to GLOBAL/GLOCAL.)
        c = _cummax_lanes(h, mp)
        val_x = c + lpe
        if mode == LOCAL:
            val_x = jnp.maximum(val_x, 0.0)

        if not score_only:
            # ptrfast X pointers (rs:172-189/214-231): X-extend wins the
            # cascade iff Xm1+pe beats BOTH opens, whose max is exactly
            # hraw = shift(max(val_m, val_y) + po, g0) — already computed
            # for the scan.  LOCAL tie directions: X needs strict `>`
            # (rs:177 `>=` favors M-open; rs:184 `>` favors X over Y) and
            # the M-vs-Y leg is strict `>`; non-LOCAL flips both to `>=`.
            # Lane 0: x0b+pe > / >= g0 reduces to 9og+11eg >/>= 0 —
            # never true for negative penalties (x_wins false) except the
            # degenerate og=eg=0 non-LOCAL case, where `>=` holds and the
            # old cascade also resolved to X.  The M-vs-Y compare is done
            # pre-shift and the 2-bit result shifted once; its lane-0
            # fill is the compare on (lsc_i+sent, lsc_i), i.e. on sent.
            # Constants pre-shifted <<2.
            #
            # xscan (r2): in the detrended domain the compare reads
            # straight off the scan.  Extend wins iff Xd[j-1] = c[j-1]
            # beats the open h[j]:
            #   LOCAL (strict):  c[j-1] > h[j]  <=>  c[j] > h[j]
            #     (c = cummax(h): if c[j-1] > h[j] then c[j] = c[j-1];
            #     else c[j] = h[j]).  NO shift, NO clamp.  Divergences
            #     from comparing the UNCLAMPED Xd[j-1] (clamped val_x is
            #     what rs:177 compares) need clamp-raised X[j-1] = 0 and
            #     eg > hraw[j], which force val_x[j] = max(eg, hraw, 0)
            #     = 0 — the CELL_STOP overwrite below masks exactly those
            #     pointers, so the emitted tb bytes are bit-identical.
            #     Lane 0: c[0] == h[0] -> False == (9og+11eg > 0).
            #   non-LOCAL (>=): shift c right with the exact boundary
            #     extend value x0b+eg as lane-0 fill: x0b+eg >= h[0]=g0
            #     <=> 9og+11eg >= 0, true only in the degenerate
            #     og=eg=0 case — same resolution as the old cascade.
            if mode == LOCAL:
                x_wins = c > h
                myp = jnp.where(val_m > val_y, 0, 8)
                fill_my = 8  # sent > 0 never holds
            else:
                if detrended:
                    x_wins = _shift_right(c, x0b + eg) >= h
                else:
                    Xm1 = _shift_right(val_x, x0b)
                    x_wins = Xm1 + pe >= hraw
                myp = jnp.where(val_m >= val_y, 0, 8)
                fill_my = 0 if sent >= 0.0 else 8
            my = _shift_right(myp, fill_my)
            prev_x = jnp.where(x_wins, 4, my)

            if mode == LOCAL:
                prev_m = jnp.where(val_m == 0.0, CELL_STOP, prev_m)
                prev_x = jnp.where(val_x == 0.0, CELL_STOP << 2, prev_x)
                prev_y = jnp.where(val_y == 0.0, CELL_STOP << 4, prev_y)

            # fields carry their final bit positions; pack is 2 ORs
            tb_ref[0, r, :, :] = (prev_m | prev_x | prev_y).astype(jnp.uint8)

            if emit_runs:
                # Match-run byte: e (bits 0-3) = EXTRA diagonal M-steps a
                # walk at this cell may take in one jump (run length
                # 1+e, capped at 16), x (bits 4-5) = the state after
                # them.  Diagonal recurrence off the previous row's byte
                # (shifted one lane, like the M path itself):
                #   prev_m != M            -> (0, prev_m)   one step
                #   prev_m == M, diag STOP -> (0, STOP)     emit this
                #     cell only, then stop WITHOUT emitting the diag
                #     (LOCAL zero cells are never emitted; walking "into"
                #     them is what ends a local path)
                #   prev_m == M, diag capped (e_d==15, x_d!=STOP)
                #                          -> (0, M)        jump restarts
                #   prev_m == M, else      -> (e_d+1, x_d)
                # STOP cells themselves store the reserved (15, STOP)
                # marker — the walk treats landing there in state M as
                # done-without-emission, mirroring walk_tiled.  Boundary
                # diagonals (row 0 / lane 0) read the capped fill
                # (15, M): one step onto the boundary, where the walk's
                # boundary logic takes over.
                e_d = _shift_right(Rp & 15, jnp.int32(15))
                x_d = _shift_right(Rp >> 4, jnp.int32(0))
                is_m = prev_m == 0
                diag_stop = (e_d == 15) & (x_d == CELL_STOP)
                # chains whose exit is STOP cap one earlier (e <= 14):
                # (15, STOP) must stay reserved for stop cells, or a
                # 16-long match chain ending at a zero cell would forge
                # the marker and truncate walks
                ecap = jnp.where(x_d == CELL_STOP, 14, 15)
                cont = is_m & jnp.logical_not(diag_stop) & (e_d < ecap)
                e = jnp.where(cont, e_d + 1, 0)
                x = jnp.where(
                    cont, x_d,
                    jnp.where(is_m,
                              jnp.where(diag_stop, CELL_STOP, 0),
                              prev_m),
                )
                if mode == LOCAL:
                    is_stop = prev_m == CELL_STOP
                    e = jnp.where(is_stop, 15, e)
                    x = jnp.where(is_stop, CELL_STOP, x)
                Rp = e | (x << 4)
                run_ref[0, r, :, :] = Rp.astype(jnp.uint8)

        # ---- running best (local): strict `>` keeps the first (smallest) i
        if mode == LOCAL:
            if masked_s:
                # padded cells of S are poisoned (batch.scores_tiled n=/m=):
                # their clamped M is <= max(0, best - 128) so an unmasked
                # max is value-exact — skips the per-row mask (2-3 wide ops).
                # The argmax POSITION is exact too (callers guarantee
                # n,m >= 1): when gmax > 0 no padded cell can tie it; when
                # gmax == 0 every lane (valid or padded) first hits 0 at
                # row i=1 under the strict `>` update, so min_i = 1 with
                # rbi owned by a real row, and the min_j tie-break at
                # _finish lands on lane 0 (j=1, valid since m >= 1) —
                # identical to the masked path.
                if not track_arg:
                    rbv = jnp.maximum(rbv, val_m)
                else:
                    upd = val_m > rbv
                    rbv = jnp.where(upd, val_m, rbv)
                    rbi = jnp.where(upd, i, rbi)
                return val_m, val_x, val_y, rbv, rbi, accv, Rp
            in_range = valid_j & (i <= nvec)
            masked = jnp.where(in_range, val_m, NEG)
            if not track_arg:
                rbv = jnp.maximum(rbv, masked)
            else:
                upd = masked > rbv
                rbv = jnp.where(upd, masked, rbv)
                rbi = jnp.where(upd, i, rbi)
        elif capture:
            # capture the whole (M, X, Y) row the row each pair's n is
            # reached (4 wide ops vs ~10 for the old per-row masked-sum
            # accumulate); the lane at m is extracted once at _finish
            fMv, fXv, fYv = accv
            sel = jnp.broadcast_to(i == nvec, (tbp, mp))
            fM = jnp.where(sel, val_m, fMv)
            fX = jnp.where(sel, val_x, fXv)
            fY = jnp.where(sel, val_y, fYv)
            accv = (fM, fX, fY)
        return val_m, val_x, val_y, rbv, rbi, accv, Rp

    # rows chained in registers per loop iteration; scratch touched once
    # per group (R=8 measured best on both paths at the headline shape —
    # see the _MAX_R note and scripts/kernel_lab.py).  SWTPU_MAX_ROWGROUP
    # overrides for A/B.
    R = _row_group(rb_rows)

    def make_group_step(capture, interior):
        def group_step(g, _):
            Mp, Xp, Yp = cm[:, :], cx[:, :], cy[:, :]
            Rp = run_c[:, :] if emit_runs else None
            if mode == LOCAL:
                rbv = runbest[:, :]
                rbi = runbest_i[:, :] if track_arg else None
                accv = None
            elif capture:
                rbv = rbi = None
                accv = (fM_s[:, :], fX_s[:, :], fY_s[:, :])
            else:
                rbv = rbi = accv = None
            for q in range(R):
                Mp, Xp, Yp, rbv, rbi, accv, Rp = one_row(
                    g * R + q, Mp, Xp, Yp, rbv, rbi, accv, Rp,
                    capture=capture, interior=interior,
                )
            cm[:, :] = Mp
            cx[:, :] = Xp
            cy[:, :] = Yp
            if emit_runs:
                run_c[:, :] = Rp
            if mode == LOCAL:
                runbest[:, :] = rbv
                if track_arg:
                    runbest_i[:, :] = rbi
            elif capture:
                fM_s[:, :], fX_s[:, :], fY_s[:, :] = accv
            return 0

        return group_step

    if mode == LOCAL or not finals_gate:
        jax.lax.fori_loop(
            0, rb_rows // R, make_group_step(True, False), 0, unroll=False
        )
    else:
        # block specialization: finals[g, rb] says whether ANY pair's final
        # row i == n lands in this row block (host-computed, SMEM).  Blocks
        # without one run a lean loop — no capture selects, and glocal
        # collapses to interior penalties (+ detrended score-only scan).
        gate = finals_ref[pl.program_id(0), rb] != 0

        @pl.when(gate)
        def _blk_with_finals():
            jax.lax.fori_loop(
                0, rb_rows // R, make_group_step(True, False), 0,
                unroll=False,
            )

        @pl.when(jnp.logical_not(gate))
        def _blk_interior():
            jax.lax.fori_loop(
                0, rb_rows // R, make_group_step(False, True), 0,
                unroll=False,
            )

    if ckpt:
        # the block index map folds several row blocks onto one checkpoint
        # block; the last write of the group is what lands in HBM, i.e. the
        # carries after the group's final row
        ckm_ref[0, 0, :, :] = cm[:, :]
        ckx_ref[0, 0, :, :] = cx[:, :]
        cky_ref[0, 0, :, :] = cy[:, :]

    @pl.when(rb == n_row_blocks - 1)
    def _finish():
        if mode == LOCAL:
            gmax = jnp.max(runbest[:, :], axis=1, keepdims=True)  # (TBP, 1)
            if not track_arg:
                zeros = jnp.zeros((tbp, STATS_W - 1), jnp.float32)
                stats_ref[0, :, :] = jnp.concatenate([gmax, zeros], axis=1)
            else:
                cand = runbest[:, :] == gmax
                ci = jnp.where(cand, runbest_i[:, :], BIGI)
                min_i = jnp.min(ci, axis=1, keepdims=True)
                cj = jnp.where(cand & (runbest_i[:, :] == min_i), jl, BIGI)
                min_j = jnp.min(cj, axis=1, keepdims=True) + 1
                zeros = jnp.zeros((tbp, STATS_W - 3), jnp.float32)
                stats_ref[0, :, :] = jnp.concatenate(
                    [
                        gmax,
                        min_i.astype(jnp.float32),
                        min_j.astype(jnp.float32),
                        zeros,
                    ],
                    axis=1,
                )
        else:
            # extract lane m-1 of each captured final row (one masked
            # sum per state, once per pair instead of per row)
            mask_col = jl + 1 == mvec
            fm = jnp.sum(jnp.where(mask_col, fM_s[:, :], 0.0), axis=1,
                         keepdims=True)
            fx = jnp.sum(jnp.where(mask_col, fX_s[:, :], 0.0), axis=1,
                         keepdims=True)
            fy = jnp.sum(jnp.where(mask_col, fY_s[:, :], 0.0), axis=1,
                         keepdims=True)
            z3 = jnp.zeros((tbp, 3), jnp.float32)
            pad = jnp.zeros((tbp, STATS_W - 6), jnp.float32)
            stats_ref[0, :, :] = jnp.concatenate([z3, fm, fx, fy, pad],
                                                 axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "og", "eg", "score_only", "interpret",
                     "masked_s", "emit_runs"),
)
def fill_tiled(
    S,  # (G, NP, TBP, MP) int8 or f32
    n,  # (G, TBP, 1) int32
    m,  # (G, TBP, 1) int32
    *,
    mode: int,
    og: float,
    eg: float,
    score_only: bool = False,
    interpret: bool = False,
    masked_s: bool = False,
    emit_runs: bool = False,
):
    """Run the fill kernel over G tiles of TBP pairs.

    Returns ``(tb, stats)``; ``tb`` is ``(G, NP, TBP, MP)`` uint8 (rows/cols
    are 1-based DP coords minus 1; boundary row/col live in closed form in
    the traceback walker).  ``stats`` is ``(G, TBP, 8)`` f32:
    ``[best, best_i, best_j, finalM, finalX, finalY, 0, 0]``.

    ``masked_s=True`` asserts the caller poisoned padded cells of S
    (``batch.scores_tiled(..., n=, m=)``), letting the LOCAL score-only
    path drop its per-row argmax mask (~2 wide ops/row).

    ``emit_runs=True`` (traceback fills only) additionally returns a
    ``run`` array (same shape/dtype as tb): per-cell match-run bytes the
    token walks use to take up to 16 diagonal steps per serial iteration
    (see the run-byte comment in _kernel).  Return becomes
    ``(tb, run, stats)``.
    """
    G, NP, tbp, MP = S.shape
    assert tbp % TB == 0, f"pair-tile {tbp} must be a multiple of {TB}"
    rb_rows = _row_block(NP, MP, tbp, S.dtype.itemsize)
    n_row_blocks = NP // rb_rows
    assert n_row_blocks * rb_rows == NP

    finals_gate = _use_finals_gate(mode, score_only, rb_rows)
    assert not (emit_runs and score_only), "runs need a traceback fill"
    kernel = functools.partial(
        _kernel,
        mode=mode,
        og=og,
        eg=eg,
        rb_rows=rb_rows,
        tbp=tbp,
        mp=MP,
        n_row_blocks=n_row_blocks,
        score_only=score_only,
        masked_s=masked_s,
        finals_gate=finals_gate,
        emit_runs=emit_runs,
    )

    in_specs = [
        pl.BlockSpec((1, tbp, 1), lambda ib, rb: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tbp, 1), lambda ib, rb: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rb_rows, tbp, MP), lambda ib, rb: (ib, rb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [n, m]
    if finals_gate:
        # finals[g, rb] = does row block rb hold some pair's final row
        # i == n?  (n >= 1 lands in block (n-1) // rb_rows; n == 0 never
        # fires the capture, matching the ungated kernel.)
        blk = (n[:, :, 0] - 1) // rb_rows  # (G, TBP)
        rbi_ = jnp.arange(n_row_blocks, dtype=jnp.int32)
        finals = jnp.any(
            blk[:, :, None] == rbi_[None, None, :], axis=1
        ).astype(jnp.int32)  # (G, n_row_blocks)
        # full-array SMEM block (TPU lowering requires whole trailing dims)
        in_specs.insert(
            2,
            pl.BlockSpec((G, n_row_blocks), lambda ib, rb: (0, 0),
                         memory_space=pltpu.SMEM),
        )
        args.append(finals)
    args.append(S)
    stats_shape = jax.ShapeDtypeStruct((G, tbp, STATS_W), jnp.float32)
    stats_spec = pl.BlockSpec((1, tbp, STATS_W), lambda ib, rb: (ib, 0, 0),
                              memory_space=pltpu.VMEM)
    scratch = _scratch(tbp, MP, mode, emit_runs=emit_runs)
    grid = (G, n_row_blocks)
    # vmem_limit_bytes: the default 16 MiB scoped-VMEM cap is exceeded by
    # the unrolled row-group temporaries at (tile=128, MP>=1024) with
    # traceback (measured 16.18M on v5e); the chip has 128 MiB VMEM.
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=64 << 20,
    )
    cost = pl.CostEstimate(
        flops=int(G) * tbp * int(NP) * int(MP) * 40,
        bytes_accessed=int(S.size * S.dtype.itemsize) * 2,
        transcendentals=0,
    )

    if score_only:
        stats = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_shape=stats_shape,
            out_specs=stats_spec,
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
        return None, stats

    tb_shape = jax.ShapeDtypeStruct((G, NP, tbp, MP), jnp.uint8)
    tb_spec = pl.BlockSpec((1, rb_rows, tbp, MP), lambda ib, rb: (ib, rb, 0, 0),
                           memory_space=pltpu.VMEM)
    if emit_runs:
        tb, run, stats = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_shape=(tb_shape, tb_shape, stats_shape),
            out_specs=(tb_spec, tb_spec, stats_spec),
            scratch_shapes=scratch,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*args)
        return tb, run, stats
    tb, stats = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_shape=(tb_shape, stats_shape),
        out_specs=(tb_spec, stats_spec),
        scratch_shapes=scratch,
        compiler_params=compiler_params,
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    return tb, stats


def _common_specs(tbp, rb_rows, MP, dtype_itemsize=None):
    in_specs = [
        pl.BlockSpec((1, tbp, 1), lambda ib, rb: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tbp, 1), lambda ib, rb: (ib, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    s_spec = pl.BlockSpec((1, rb_rows, tbp, MP), lambda ib, rb: (ib, rb, 0, 0),
                          memory_space=pltpu.VMEM)
    stats_spec = pl.BlockSpec((1, tbp, STATS_W), lambda ib, rb: (ib, 0, 0),
                              memory_space=pltpu.VMEM)
    return in_specs, s_spec, stats_spec


def _scratch(tbp, MP, mode, emit_runs: bool = False):
    """Slots 0-2: (M, X, Y) carries.  Slots 3-5 are mode-dependent: LOCAL
    tracks the running best value + its row; other modes capture the
    (M, X, Y) rows at each pair's final row i == n (see _kernel).
    ``emit_runs`` appends the match-run carry slot."""
    common = [
        pltpu.VMEM((tbp, MP), jnp.float32),
        pltpu.VMEM((tbp, MP), jnp.float32),
        pltpu.VMEM((tbp, MP), jnp.float32),
        pltpu.VMEM((tbp, MP), jnp.float32),
    ]
    if mode == LOCAL:
        out = common + [
            pltpu.VMEM((tbp, MP), jnp.int32),       # runbest_i
            pltpu.VMEM((tbp, STATS_W), jnp.float32),  # unused
        ]
    else:
        out = common + [
            pltpu.VMEM((tbp, MP), jnp.float32),  # fX
            pltpu.VMEM((tbp, MP), jnp.float32),  # fY
        ]
    if emit_runs:
        out.append(pltpu.VMEM((tbp, MP), jnp.int32))  # match-run carry
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mode", "og", "eg", "ckpt_rows", "interpret"),
)
def fill_checkpointed(
    S,  # (G, NP, TBP, MP) int8 or f32
    n,  # (G, TBP, 1) int32
    m,  # (G, TBP, 1) int32
    *,
    mode: int,
    og: float,
    eg: float,
    ckpt_rows: int,
    interpret: bool = False,
):
    """Score-only fill that also checkpoints the (M, X, Y) carry rows every
    ``ckpt_rows`` rows.  Returns ``(stats, (ckm, ckx, cky))`` with each
    checkpoint array shaped (G, NP // ckpt_rows, TBP, MP) f32; checkpoint k
    holds the carries after global row ``(k+1) * ckpt_rows``.

    This is the memory-lean half of long-sequence traceback
    (O(NP/ckpt_rows * MP) instead of O(NP * MP) pointer bytes); segments are
    then re-filled with :func:`fill_band`.
    """
    G, NP, tbp, MP = S.shape
    rb_rows = min(_row_block(NP, MP, tbp, S.dtype.itemsize), ckpt_rows)
    while rb_rows > 1 and (NP % rb_rows or ckpt_rows % rb_rows):
        rb_rows //= 2
    if ckpt_rows % rb_rows or NP % rb_rows:
        raise ValueError(
            f"ckpt_rows {ckpt_rows} / NP {NP} not multiples of row block {rb_rows}"
        )
    if NP % ckpt_rows:
        raise ValueError(f"NP {NP} not a multiple of ckpt_rows {ckpt_rows}")
    spc = ckpt_rows // rb_rows  # row blocks per checkpoint
    n_row_blocks = NP // rb_rows
    ncks = NP // ckpt_rows

    kernel = functools.partial(
        _kernel,
        mode=mode, og=og, eg=eg, rb_rows=rb_rows, tbp=tbp, mp=MP,
        n_row_blocks=n_row_blocks, score_only=True, ckpt=True,
    )
    in_specs, s_spec, stats_spec = _common_specs(tbp, rb_rows, MP)
    ck_shape = jax.ShapeDtypeStruct((G, ncks, tbp, MP), jnp.float32)
    ck_spec = pl.BlockSpec(
        (1, 1, tbp, MP), lambda ib, rb: (ib, rb // spc, 0, 0),
        memory_space=pltpu.VMEM,
    )
    stats, ckm, ckx, cky = pl.pallas_call(
        kernel,
        grid=(G, n_row_blocks),
        in_specs=in_specs + [s_spec],
        out_shape=(
            jax.ShapeDtypeStruct((G, tbp, STATS_W), jnp.float32),
            ck_shape, ck_shape, ck_shape,
        ),
        out_specs=(stats_spec, ck_spec, ck_spec, ck_spec),
        scratch_shapes=_scratch(tbp, MP, mode),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 << 20,
        ),
        interpret=interpret,
    )(n, m, S)
    return stats, (ckm, ckx, cky)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "og", "eg", "interpret"),
)
def fill_band(
    S_band,  # (G, C, TBP, MP) int8 or f32
    n,       # (G, TBP, 1) int32 — TRUE total lengths, not band lengths
    m,       # (G, TBP, 1) int32
    i0,      # (1, 1) int32 — global row index of the row above the band
    icm, icx, icy,  # (G, TBP, MP) f32 — carries at global row i0
    *,
    mode: int,
    og: float,
    eg: float,
    interpret: bool = False,
):
    """Re-fill a ``C``-row band seeded from checkpointed carries, emitting
    traceback pointers for the band.  Returns ``(tb_band, stats)`` with
    ``tb_band`` shaped like ``S_band`` (uint8)."""
    G, C, tbp, MP = S_band.shape
    rb_rows = _row_block(C, MP, tbp, S_band.dtype.itemsize)
    n_row_blocks = C // rb_rows

    kernel = functools.partial(
        _kernel,
        mode=mode, og=og, eg=eg, rb_rows=rb_rows, tbp=tbp, mp=MP,
        n_row_blocks=n_row_blocks, score_only=False, seeded=True,
    )
    in_specs, s_spec, stats_spec = _common_specs(tbp, rb_rows, MP)
    seed_spec = pl.BlockSpec((1, tbp, MP), lambda ib, rb: (ib, 0, 0),
                             memory_space=pltpu.VMEM)
    i0_spec = pl.BlockSpec((1, 1), lambda ib, rb: (0, 0),
                           memory_space=pltpu.SMEM)
    tb_spec = pl.BlockSpec((1, rb_rows, tbp, MP), lambda ib, rb: (ib, rb, 0, 0),
                           memory_space=pltpu.VMEM)
    tb, stats = pl.pallas_call(
        kernel,
        grid=(G, n_row_blocks),
        in_specs=in_specs + [i0_spec, seed_spec, seed_spec, seed_spec, s_spec],
        out_shape=(
            jax.ShapeDtypeStruct((G, C, tbp, MP), jnp.uint8),
            jax.ShapeDtypeStruct((G, tbp, STATS_W), jnp.float32),
        ),
        out_specs=(tb_spec, stats_spec),
        scratch_shapes=_scratch(tbp, MP, mode),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 << 20,
        ),
        interpret=interpret,
    )(n, m, i0, icm, icx, icy, S_band)
    return tb, stats
