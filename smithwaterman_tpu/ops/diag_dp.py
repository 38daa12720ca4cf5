"""Anti-diagonal (wavefront) Pallas fill — LOCAL score-only fast path.

The row kernel (ops/pallas_dp.py) pays an 18-wide-op Hillis-Steele lane
cummax per row for the X state; that scan is mandated only by ROW-MAJOR
evaluation order.  Along an anti-diagonal i+j=d no cell depends on another
(the same wavefront the reference's OpenCL kernel exploits with per-column
spin-waiting work-items, opencl_sequence_alignment.rs:358-524), so a
skewed-layout kernel computes every state with plain elementwise ops:

  * The DP matrix is cut into column strips of ``LW`` = 128 lanes.  Within
    a strip, step ``d`` holds at lane ``l`` the states of cell
    ``(r = d - l, c = c0 + l)`` (0-based interior coords); a strip runs
    ``ND = NP + LW`` steps (the (NP+128)/NP ramp is the price of the skew).
  * Per step (LOCAL):  T0 = max(W1 + og, 0);  Y = max(T0, Y1 + eg);
    X = shift(max(T0, X1 + eg));  M = max(shift(W2) + s, 0);
    W = max(M, X, Y).  The open-from-any-state fold through
    ``W1 = max(M, X, Y)`` is value-exact because ``og <= eg <= 0``
    (internal penalties are non-positive) makes the folded ``X + og``
    (resp. ``Y + og``) never beat the true extend term ``X + eg``; the
    ``max(., 0)`` inside T0 commutes with the outer maxes (LOCAL clamps
    every state at 0, rs:256-260).
  * Cross-strip dependencies ride two VMEM edge rings indexed by step:
    strip ``s`` stores its lane-127 ``W`` and ``X`` per row; strip ``s+1``
    reads them back as its lane-0 shift fills.  A single buffer per ring
    suffices: within a strip, the read cursor (slot d+126/d+127) leads
    the write cursor (slot d) by >125 slots, so each strip reads the
    previous strip's value before overwriting the slot with its own.
    The rings are laid out ``(slot_group, pairs, r_group)`` so every
    dynamic index lands on the untiled leading axis (Mosaic cannot prove
    lane/sublane alignment for dynamic offsets like d+127); the odd
    +126/+127 offsets become static lane slices of two adjacent groups.
  * Boundary/ramp handling collapses to zero-fills + poisoned S: LOCAL
    boundary rows/cols clamp to W = X = 0 / Y <= 0, and every off-matrix
    or padded cell carries the poison substitution score (-128), which
    pins its M at 0 (see the ``masked_s`` proof in pallas_dp._kernel) —
    0 can never raise the LOCAL running best.  Bottom-ramp cells
    (r >= NP) can hold positive W via gap chains, but their values only
    ever flow to cells with the same r (X: same row, Y/M: deeper rows),
    never back above row NP.

Score-only LOCAL is exactly the shape of the clustering / sweep hot loop
(sa_opencl/src/main.rs:180-243 aligns with ``score_only`` to threshold
identity), where the scan is pure overhead: no traceback pointers are
emitted, so evaluation order is unobservable.

Traceback and non-LOCAL modes stay on the row kernel: pointer extraction
costs the same per cell in either order (the scan's savings are offset by
the skew ramp), and non-LOCAL needs per-lane final-row/col captures that
erase the wavefront's op advantage.

MEASURED OUTCOME (v5e, headline shape 512x512x512, MEASURE_DIAG_r02.log):
the wavefront kernel TIES the row kernel — 43.7 vs 43.3 GCUPS score-only
— BEFORE paying its skew-gather relayout, and an S-byte-width probe
(f32 S = 4x bytes, same speed) shows neither kernel is S-stream-bound.
Both evaluation orders hit a common ~43.5 GCUPS ceiling that the wide-op
count difference does not move (per-step narrow-slab and loop overheads
dominate the scan savings).  The row kernel therefore remains the
production default for every path; this module stays as the measured
negative result and as the scan-free reference implementation
(BatchAligner(diag_scores=True) routes eligible buckets here for A/B).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dp import STATS_W, TB

LW = 128   # strip width = VPU lane count
NEG = -1.0e30


def eligible(*, mode: int, og: float, eg: float, np_pad: int, mp_pad: int,
             tbp: int, score_only: bool, masked_s: bool) -> bool:
    """True when the wavefront score path may replace the row kernel.

    LOCAL score-only with poisoned-S padding (masked_s) on 128-aligned
    buckets, with internal penalties satisfying the open-from-W fold
    precondition og <= eg <= 0.  Everything else stays on the row kernel.
    """
    from ..config import LOCAL

    return (
        score_only
        and masked_s
        and mode == LOCAL
        and og <= eg <= 0.0
        and np_pad % LW == 0
        and mp_pad % LW == 0
        and tbp % TB == 0
    )


def _shift_right(v, fill):
    pad = jnp.broadcast_to(fill, v.shape[:-1] + (1,)).astype(v.dtype)
    return jnp.concatenate([pad, v[:, :-1]], axis=1)


@functools.partial(jax.jit, static_argnames=("tile",))
def skew_scores(S_tiled, *, tile: int = 0):
    """(G, NP, TBP, MP) row-layout scores -> (G, nstrip, ND, TBP, LW) skewed.

    ``out[g, s, d, p, l] = S[g, d - l, p, s*LW + l]`` for ``0 <= d-l < NP``,
    poison (-128 int8 / -1e9 f32) elsewhere.  One XLA gather pass at HBM
    bandwidth; int8 keeps it at ~2 bytes/cell of traffic.
    """
    G, NP, tbp, MP = S_tiled.shape
    assert MP % LW == 0, f"diag path needs MP % {LW} == 0, got {MP}"
    nstrip = MP // LW
    ND = NP + LW
    poison = jnp.asarray(-128 if S_tiled.dtype == jnp.int8 else -1.0e9,
                         S_tiled.dtype)
    # pad rows so the clipped gather index always lands on poison
    Sp = jnp.pad(S_tiled, ((0, 0), (0, 1), (0, 0), (0, 0)),
                 constant_values=poison)
    # (G, NP+1, TBP, nstrip, LW) -> (G, nstrip, NP+1, TBP, LW)
    Ss = Sp.reshape(G, NP + 1, tbp, nstrip, LW).transpose(0, 3, 1, 2, 4)
    d = jax.lax.broadcasted_iota(jnp.int32, (G, nstrip, ND, tbp, LW), 2)
    ll = jax.lax.broadcasted_iota(jnp.int32, (G, nstrip, ND, tbp, LW), 4)
    r = d - ll
    idx = jnp.where((r >= 0) & (r < NP), r, NP)  # NP = the poison row
    return jnp.take_along_axis(Ss, idx, axis=2)


def _diag_kernel(
    s_ref, ch_ref, stats_ref, cw1, cw2, cx, cy, runbest, edge_w, edge_x,
    *, og: float, eg: float, db: int, tbp: int, nd: int, n_db: int,
    nstrip: int, r_group: int,
):
    """One (grid g, strip sid, diag-block dbk) step; see module docstring.

    Edge-ring slot convention: flat slot ``t`` holds strip ``sid``'s
    lane-127 values at step ``t`` — row ``r = t - 127`` (W in edge_w, X in
    edge_x).  Ramp steps t < 127 store the "rows" r < 0, which hold
    exactly 0, the LOCAL boundary value (every top-ramp state is pinned
    at 0 by the poison-S + clamp argument).  Reading strip ``sid``'s
    lane-0 fills at step ``d``:
      fw = W(d-1, prev col)       -> flat slot d + 126
      fx from (W, X)(d, prev col) -> flat slot d + 127
    The read cursor leads this strip's write cursor (slot d) by >125
    slots, so every slot is read (previous strip's value) before this
    strip overwrites it.  Slots >= ND are never written; they stay 0 and
    only feed bottom-ramp cells whose values are dead (module docstring).

    Flat slots are stored as ``ring[slot // r_group, :, slot % r_group]``:
    a group's write covers exactly one leading index; the +126/+127 read
    offsets are recombined from two adjacent groups with static slices.
    """
    sid = pl.program_id(1)
    dbk = pl.program_id(2)
    # ch_ref is the benchmark-chaining scalar (always 0.0 in production):
    # adding exact 0.0 to og is bit-neutral but makes the fill depend on a
    # tiny input, so serialized timing chains need not stream S per call
    ogv = jnp.float32(og) + ch_ref[0]
    egv = jnp.float32(eg)
    n_groups = nd // r_group + 127 // r_group + 1  # ring leading dim

    @pl.when((sid == 0) & (dbk == 0))
    def _init_best():
        runbest[:, :] = jnp.zeros((tbp, LW), jnp.float32)

    @pl.when(dbk == 0)
    def _init_strip():
        # LOCAL boundary == clamped ramp state: everything zero
        z = jnp.zeros((tbp, LW), jnp.float32)
        cw1[:, :] = z
        cw2[:, :] = z
        cx[:, :] = z
        cy[:, :] = z

    @pl.when((sid == 0) & (dbk == 0))
    def _init_edges():
        def _zero(i, _):
            z = jnp.zeros((tbp, r_group), jnp.float32)
            edge_w[i, :, :] = z
            edge_x[i, :, :] = z
            return 0
        jax.lax.fori_loop(0, n_groups, _zero, 0)

    def one_step(qb, qg, W1, W2, X1, Y1, rbv, fws, fxs, wacc, xacc):
        # qb: step within this diag block (s_ref rows); qg: within the group
        s = s_ref[0, 0, qb, :, :].astype(jnp.float32)
        T0 = jnp.maximum(W1 + ogv, 0.0)
        val_y = jnp.maximum(T0, Y1 + egv)
        xpre = jnp.maximum(T0, X1 + egv)
        val_x = _shift_right(xpre, fxs[:, qg: qg + 1])
        val_m = jnp.maximum(_shift_right(W2, fws[:, qg: qg + 1]) + s, 0.0)
        W = jnp.maximum(jnp.maximum(val_m, val_x), val_y)
        rbv = jnp.maximum(rbv, val_m)
        wacc.append(W[:, LW - 1: LW])
        xacc.append(val_x[:, LW - 1: LW])
        return W1, W, val_x, val_y, rbv

    base = dbk * db

    # static split of the +126 / +127 read offsets into (group, lane)
    a1, rem1 = divmod(LW - 2, r_group)
    rem2 = rem1 + 1
    assert (LW - 1) // r_group == a1, r_group  # both offsets share a group pair

    def _win(ga, gb, rem):
        # flat slots [t0 + a1*r_group + rem, +r_group) as one (tbp, r) slab
        if rem == 0:
            return ga
        if rem == r_group:
            return gb
        return jnp.concatenate([ga[:, rem:], gb[:, :rem]], axis=1)

    def group_step(g, _):
        kg = dbk * (db // r_group) + g  # flat slot group t0 // r_group
        t0 = base + g * r_group
        W1, W2 = cw1[:, :], cw2[:, :]
        X1, Y1 = cx[:, :], cy[:, :]
        rbv = runbest[:, :]
        # lane-0 fills for the group's steps d = t0..t0+R-1 (narrow slabs):
        #   fw[q] = W(d-1, 127 of prev strip)             -> flat slot d + 126
        #   fx[q] = max(max(We+og, 0), Xe+eg) of row d    -> flat slot d + 127
        gaw = edge_w[kg + a1, :, :]
        gbw = edge_w[kg + a1 + 1, :, :]
        gax = edge_x[kg + a1, :, :]
        gbx = edge_x[kg + a1 + 1, :, :]
        fws = _win(gaw, gbw, rem1)
        we = _win(gaw, gbw, rem2)
        xe = _win(gax, gbx, rem2)
        fxs = jnp.maximum(jnp.maximum(we + ogv, 0.0), xe + egv)
        wacc, xacc = [], []
        for q in range(r_group):
            W2, W1, X1, Y1, rbv = one_step(
                g * r_group + q, q, W1, W2, X1, Y1, rbv, fws, fxs, wacc, xacc
            )
        cw1[:, :] = W1
        cw2[:, :] = W2
        cx[:, :] = X1
        cy[:, :] = Y1
        runbest[:, :] = rbv
        # this strip's lane-127 (W, X) at steps t0..t0+R-1 -> flat slot t
        edge_w[kg, :, :] = jnp.concatenate(wacc, axis=1)
        edge_x[kg, :, :] = jnp.concatenate(xacc, axis=1)
        return 0

    jax.lax.fori_loop(0, db // r_group, group_step, 0, unroll=False)

    @pl.when((sid == nstrip - 1) & (dbk == n_db - 1))
    def _finish():
        gmax = jnp.max(runbest[:, :], axis=1, keepdims=True)
        zeros = jnp.zeros((tbp, STATS_W - 1), jnp.float32)
        stats_ref[0, :, :] = jnp.concatenate([gmax, zeros], axis=1)


@functools.partial(
    jax.jit, static_argnames=("og", "eg", "interpret", "r_group", "db")
)
def fill_diag_scores(
    S_tiled,
    *,
    og: float,
    eg: float,
    interpret: bool = False,
    r_group: int = 8,
    db: int = LW,
    chain=None,
):
    """LOCAL score-only fill via the wavefront kernel.

    Args:
      S_tiled: (G, NP, TBP, MP) int8/f32 substitution scores, POISONED at
        padded cells (``batch.scores_tiled(..., n=, m=)``) — the diag path
        requires the masked_s contract; there is no masked variant.
      chain: optional (1,) f32 holding exact 0.0 — benchmark serialization
        hook (see _diag_kernel); None in production.
    Returns:
      stats (G, TBP, STATS_W) f32 with ``stats[..., 0]`` = best LOCAL
      score per pair — same contract as ``fill_tiled(score_only=True)``
      without argmax tracking.
    """
    S_sk = skew_scores(S_tiled)
    return fill_diag_skewed(
        S_sk, og=og, eg=eg, interpret=interpret, r_group=r_group, db=db,
        chain=chain,
    )


@functools.partial(
    jax.jit, static_argnames=("og", "eg", "interpret", "r_group", "db")
)
def fill_diag_skewed(
    S_sk,
    *,
    og: float,
    eg: float,
    interpret: bool = False,
    r_group: int = 8,
    db: int = LW,
    chain=None,
):
    """Wavefront fill on pre-skewed scores (``skew_scores`` output)."""
    G, nstrip, ND, tbp, _lw = S_sk.shape
    assert _lw == LW
    assert tbp % TB == 0
    # the open-from-W fold needs opening to cost at least as much as
    # extending (og <= eg <= 0 in internal negated form); callers fall
    # back to the row kernel for the degenerate og > eg configurations
    assert og <= eg <= 0.0, (og, eg)
    if chain is None:
        chain = jnp.zeros((1,), jnp.float32)
    assert ND % db == 0 and db % r_group == 0
    n_db = ND // db
    kernel = functools.partial(
        _diag_kernel,
        og=og, eg=eg, db=db, tbp=tbp, nd=ND, n_db=n_db, nstrip=nstrip,
        r_group=r_group,
    )
    in_specs = [
        pl.BlockSpec((1, 1, db, tbp, LW), lambda g, s, d: (g, s, d, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chain scalar
    ]
    stats_shape = jax.ShapeDtypeStruct((G, tbp, STATS_W), jnp.float32)
    stats_spec = pl.BlockSpec((1, tbp, STATS_W), lambda g, s, d: (g, 0, 0),
                              memory_space=pltpu.VMEM)
    n_groups = ND // r_group + 127 // r_group + 1
    scratch = [
        pltpu.VMEM((tbp, LW), jnp.float32),            # cw1
        pltpu.VMEM((tbp, LW), jnp.float32),            # cw2
        pltpu.VMEM((tbp, LW), jnp.float32),            # cx
        pltpu.VMEM((tbp, LW), jnp.float32),            # cy
        pltpu.VMEM((tbp, LW), jnp.float32),            # runbest
        pltpu.VMEM((n_groups, tbp, r_group), jnp.float32),  # edge_w
        pltpu.VMEM((n_groups, tbp, r_group), jnp.float32),  # edge_x
    ]
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        vmem_limit_bytes=64 << 20,
    )
    stats = pl.pallas_call(
        kernel,
        grid=(G, nstrip, n_db),
        in_specs=in_specs,
        out_shape=stats_shape,
        out_specs=stats_spec,
        scratch_shapes=scratch,
        compiler_params=cp,
        interpret=interpret,
    )(S_sk, chain)
    return stats
