#!/usr/bin/env python3
"""Kernel experiment lab: measure fill-kernel variants on the real TPU.

Exploratory harness for the round-2 perf push (VERDICT.md next-round #1).
Each variant is a self-contained copy of the LOCAL-mode row kernel from
ops/pallas_dp.py with one lever changed; all variants run in ONE process
(the axon tunnel recompiles every shape per process) with honest chained
timing (lax.scan dependency chain, min of 3).

Usage:  python -u scripts/kernel_lab.py [variant ...]
        (no args = run the default sweep; prints one JSON line per variant)

Variants are perf experiments only — correctness of kept ideas is enforced
by porting them into ops/pallas_dp.py under tests/test_pallas_kernel.py.

r2 conclusions (512 pairs x 512x512, LOCAL; compare only WITHIN one
process — cross-process variance is ~±15%):
  * base-i8 ~29 GCUPS score-only / ~22 traceback; the kernel runs AT the
    VPU's ~1-vector-op/cycle issue throughput, so only op-count matters.
  * KEPT (ported to ops/pallas_dp.py): fuse_max3 (+11%), LOCAL h0-fold
    skip, R=8 row groups (fuse+R8 = 33.0 score-only), xscan (X pointer
    = c > h straight off the detrended scan, no shift/clamp — verified
    bit-exact in interpret mode here, measured in production: local tb
    31.5 -> 33.4, so 41.6 -> 44.4 GCUPS).  The older detrend-tb variant
    (clamp+shift+cmp) stays as the negative control it was.
  * NO GAIN: f32 S (-2%), nomask, nchain 2/4 (ILP splits spill), tile 64
    (-25%) / 256 (flat), rb16-f32, R8/R16 without fuse.
  * fakecummax = 44.6 GCUPS: the ceiling with the X-scan free — the scan
    (18 of ~31 wide ops/row) is the exactness-mandated floor.
  * ptreq (pm_pre by equality vs the fused max W, 2 fewer jnp ops):
    SLOWER in-process (23.9 vs 25.1 tb-ptrfast) — Mosaic evidently
    already fuses the >= cascade; the == form extends W's live range.
  * i16 x2-domain (the 2x lever): BLOCKED — Mosaic fails to legalize
    vector<8x128x2xi16> arith.maxsi (and int16 reductions).  Re-run the
    i16 variants after toolchain updates; the kernel code here is ready.
  * Timing pitfalls (cost r1 a wrong diagnosis): chain executions AND
    force a device->host value read per measurement AND vary an input
    buffer per call — block_until_ready returns early on the axon tunnel
    and identical (program, args) executions are served from cache.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1.0e30


def _shift_right(v, fill):
    pad = jnp.broadcast_to(fill, v.shape[:-1] + (1,)).astype(v.dtype)
    return jnp.concatenate([pad, v[:, :-1]], axis=1)


def _cummax_lanes(v, width: int, fill, jm=jnp.maximum):
    sh = 1
    while sh < width:
        shifted = jnp.concatenate(
            [jnp.full(v.shape[:-1] + (sh,), fill, v.dtype), v[:, :-sh]], axis=1
        )
        v = jm(v, shifted)
        sh *= 2
    return v


def _lab_kernel(
    bump_ref, s_ref, stats_ref, cm, cx, cy, runbest,
    *, og, eg, rb_rows, tbp, mp, n_row_blocks, R,
    fuse_max3, nomask, fake_cummax, nchain, traceback, i16=False,
    selmax=False, ptrfast=False, detrend=False, ptreq=False, xscan=False,
    i16store=False, tbdrop=None, bareroll=False, tb_ref=None,
):
    """LOCAL-mode score-only (or traceback) row kernel, parameterized.

    i16: exact x2-integer score domain — all row math in int16 (scores are
    half-integers, so 2x values are ints; exact for |2v| < 32767, i.e.
    buckets up to ~1400 rows with BLOSUM62).  Halves per-op vreg count.
    """
    if selmax:
        def jm(a, b):  # i16 probe: Mosaic rejects vector maxsi, try cmp+select
            return jnp.where(a > b, a, b)
    else:
        jm = jnp.maximum
    rb = pl.program_id(1)
    if i16:
        dt = jnp.int16
        og2, eg2 = int(2 * og), int(2 * eg)
        og = jnp.int16(og2)
        eg = jnp.int16(eg2)
        sent = jnp.int16(10 * og2 + 10 * eg2)
        NEGv = jnp.int16(-20000)
        zero, mone = jnp.int16(0), jnp.int16(-2)
    else:
        dt = jnp.float32
        sent = 10.0 * og + 10.0 * eg
        NEGv = jnp.float32(NEG)
        zero, mone = jnp.float32(0.0), jnp.float32(-1.0)
    jl = jax.lax.broadcasted_iota(jnp.int32, (tbp // nchain, mp), 1)
    lanef = jl.astype(dt)
    lanef_pe = lanef * eg
    povec = og - lanef_pe - eg  # loop-invariant: og - (l+1)*eg (detrend)

    if i16store:
        # workaround (b) of the i16 attack (I16_RETEST_r03.log): f32
        # compute, int16 x2-domain VMEM storage for the carry slabs.
        # Exact for |2v| < 32767 (scores are half-integers); the convert
        # pair runs once per R-row group, not per row.
        def _ld(ref, sl):
            return ref[sl, :].astype(jnp.float32) * 0.5

        def _st(ref, sl, v):
            ref[sl, :] = (v + v).astype(jnp.int16)
    else:
        def _ld(ref, sl):
            return ref[sl, :]

        def _st(ref, sl, v):
            ref[sl, :] = v

    @pl.when(rb == 0)
    def _init():
        # local: so=se=0 -> lsc = 0 (pallas_dp: lsc = jf1*se + (so-se))
        full = jnp.zeros((tbp // nchain, mp), dt)
        for c in range(nchain):
            sl = slice(c * (tbp // nchain), (c + 1) * (tbp // nchain))
            _st(cm, sl, full + sent)
            _st(cx, sl, full)
            _st(cy, sl, full + sent)
            _st(runbest, sl, jnp.full((tbp // nchain, mp), NEGv, dt))

    def one_row(r, Mp, Xp, Yp, rbv, srow_all, coff):
        i = rb * rb_rows + r + 1
        srow = srow_all
        at_first = i == 1
        # vector-shaped fills: Mosaic has no scalar i16 select
        fsh = (tbp // nchain, 1)

        def fillv(a, b):
            return jnp.where(
                jnp.broadcast_to(at_first, fsh),
                jnp.full(fsh, a, dt), jnp.full(fsh, b, dt),
            )

        fill_m = fillv(zero, sent)
        fill_x = fillv(mone, sent)
        fill_y = fillv(mone, zero)

        if fuse_max3:
            U = jm(Mp, Xp)
            W = jm(U, Yp)
            fill_w = jm(jm(fill_m, fill_x), fill_y)
            val_m = _shift_right(W, fill_w) + srow
            Ue = U + og
            Ye = Yp + eg
            val_y = jm(Ue, Ye)
        else:
            Mp1 = _shift_right(Mp, fill_m)
            Xp1 = _shift_right(Xp, fill_x)
            Yp1 = _shift_right(Yp, fill_y)
            val_m = jm(jm(Mp1, Xp1), Yp1) + srow
            val_y = jm(jm(Mp, Xp) + og, Yp + eg)

        if i16:
            p0, p1, p2, p3 = (jnp.int16(v) for v in (0, 1, 2, 3))
        else:
            p0, p1, p2, p3 = 0, 1, 2, 3
        if traceback and ptrfast and tbdrop in ("prevm", "all"):
            prev_m = jnp.zeros((tbp // nchain, mp), jnp.int32)
        elif traceback and ptrfast:
            # argmax of (M, X, Y) computed pre-shift (tie order M >= X >= Y),
            # then the packed 2-bit result is shifted ONCE; boundary lane 0
            # resolves to 0 (i==1) / 2 (else) in every mode (fills are
            # (0,-1,-1) / (L+sent, L+sent, L) with sent < 0)
            if ptreq:
                # equality vs the fused running max W replaces the
                # 3-compare cascade (2 fewer wide ops, bit-identical):
                # Mp == W iff Mp >= both; else Xp == W iff Xp >= Yp
                pm_pre = jnp.where(Mp == W, p0, jnp.where(Xp == W, p1, p2))
            else:
                pm_pre = jnp.where(
                    Mp >= Xp,
                    jnp.where(Mp >= Yp, p0, p2),
                    jnp.where(Xp >= Yp, p1, p2),
                )
            if bareroll:
                # lane-0 fill dropped: rolled-in garbage lands on cells
                # (i, 1) whose M-pointer targets the j=0 boundary, where
                # every walker normalizes the state; garbage in {0,1,2}
                # can never fake CELL_STOP (the override lands after)
                prev_m = pltpu.roll(pm_pre, shift=1, axis=1)
            else:
                fill_pm = jnp.where(
                    jnp.broadcast_to(at_first, fsh),
                    jnp.zeros(fsh, jnp.int32), jnp.full(fsh, 2, jnp.int32),
                )
                prev_m = _shift_right(pm_pre, fill_pm)
            # Y-extend wins the cascade iff it strictly beats BOTH opens,
            # i.e. Ye > max(Mp,Xp)+og = Ue (one cmp, operands reused from
            # val_y).  In the else branch Ue >= Ye holds, so the old
            # c1 = (Mp+og >= Ye) is implied by c2 = (Mp > Xp) (then
            # Ue = Mp+og) and irrelevant when !c2 — just select on c2.
            # Constants pre-shifted <<4.
            if tbdrop in ("prevy", "all"):
                prev_y = None  # replaced with a constant at pack time
            else:
                ygt = Ye > Ue
                c2 = Mp > Xp
                prev_y = jnp.where(ygt, 32, jnp.where(c2, 0, 16))
        elif traceback:
            Mp1t = _shift_right(Mp, fill_m)
            Xp1t = _shift_right(Xp, fill_x)
            Yp1t = _shift_right(Yp, fill_y)
            m_ge_x = Mp1t >= Xp1t
            m_ge_y = Mp1t >= Yp1t
            x_ge_y = Xp1t >= Yp1t
            prev_m = jnp.where(
                m_ge_x, jnp.where(m_ge_y, p0, p2), jnp.where(x_ge_y, p1, p2)
            )
            c1 = Mp + og >= Yp + eg
            c2 = Mp > Xp
            c3 = Yp + eg > Xp + og
            prev_y = jnp.where(c1, jnp.where(c2, p0, p1), jnp.where(c3, p2, p1))

        val_m = jm(val_m, zero)
        val_y = jm(val_y, zero)

        x0b = sent  # local lsc_i = 0
        g0 = og
        if detrend:
            # fold the +og and the per-lane detrend into ONE precomputed
            # vector applied BEFORE the shift: D[l] = G[l] + og - (l+1)*eg,
            # so shift(D)[l] = G[l-1] + og - l*eg = h[l] exactly (saves the
            # separate `- lanef*eg` wide op; lane-0 fill g0 is unchanged
            # since the l=0 detrend term is zero)
            D = jm(val_m, val_y) + povec
            h = _shift_right(D, g0)
        else:
            gline = jm(val_m, val_y) + og
            hraw = _shift_right(gline, g0)
            h = hraw - lanef_pe
            h0 = jm(
                jnp.broadcast_to(jnp.asarray(g0), (tbp // nchain, 1)).astype(dt),
                x0b + eg,
            )
            h = jnp.where(
                jl == 0, jnp.broadcast_to(h0, (tbp // nchain, mp)), h
            )
        if fake_cummax:
            c = h + h  # ablation: keep the dep, drop the scan
        else:
            c = _cummax_lanes(h, mp, NEGv, jm)
        val_x = c + lanef_pe
        val_x = jm(val_x, zero)

        if traceback and ptrfast:
            # X-extend wins iff Xm1+eg strictly beats BOTH opens, whose max
            # is exactly hraw = shift(max(val_m, val_y) + og) — already
            # computed for the scan (lane 0: x0b+eg > g0 is never true, and
            # the M-vs-Y fill resolves to Y=8, matching the old cascade)
            if detrend and xscan:
                # X pointer straight from the scan, NO shift/clamp:
                # extend wins (strict, LOCAL) iff c[j-1] > h[j] iff
                # c[j] > h[j] (c is the cummax of h).  The clamped-X[j-1]
                # divergence cases all land on val_x[j] == 0, where the
                # CELL_STOP overwrite below masks the pointer (proof in
                # ops/pallas_dp.py); lane 0 has c[0] == h[0] -> False,
                # matching x0b+eg > g0 for admissible penalties.
                x_wins = c > h
            elif detrend:
                # same compare in the detrended domain: clamp c at -l*eg
                # (== val_x clamped at 0), shift, strict > h; lane-0 fill
                # NEG keeps x_wins false there as before
                c_cl = jm(c, -lanef_pe)
                x_wins = _shift_right(c_cl, NEGv) > h
            else:
                Xm1 = _shift_right(val_x, x0b)
                x_wins = Xm1 + eg > hraw
            if tbdrop in ("prevx", "all"):
                prev_x = jnp.full((tbp // nchain, mp), 4, jnp.int32)
            else:
                myp = jnp.where(val_m > val_y, 0, 8)  # consts pre-shifted <<2
                if bareroll:
                    my = pltpu.roll(myp, shift=1, axis=1)
                else:
                    my = _shift_right(myp, 8)
                prev_x = jnp.where(x_wins, 4, my)
            if tbdrop in ("prevy", "all"):
                prev_y = jnp.full((tbp // nchain, mp), 16, jnp.int32)
            if tbdrop not in ("override", "all"):
                prev_m = jnp.where(val_m == zero, 3, prev_m)
                prev_x = jnp.where(val_x == zero, 12, prev_x)
                prev_y = jnp.where(val_y == zero, 48, prev_y)
            packed = prev_m | prev_x | prev_y
            if tbdrop == "store":
                rbv = jm(rbv, packed.astype(jnp.float32))
            else:
                tb_ref[0, r, pl.ds(coff, tbp // nchain), :] = packed.astype(jnp.uint8)
        elif traceback:
            Mm1 = _shift_right(val_m, sent)
            Xm1 = _shift_right(val_x, x0b)
            Ym1 = _shift_right(val_y, zero)
            d1 = Mm1 + og >= Xm1 + eg
            d2 = Mm1 > Ym1
            d3 = Xm1 + eg > Ym1 + og
            prev_x = jnp.where(d1, jnp.where(d2, p0, p2), jnp.where(d3, p1, p2))
            prev_m = jnp.where(val_m == zero, p3, prev_m)
            prev_x = jnp.where(val_x == zero, p3, prev_x)
            prev_y = jnp.where(val_y == zero, p3, prev_y)
            if i16:
                # no sub-word shifts in Mosaic: pack multiplicatively
                packed = prev_m + prev_x * jnp.int16(4) + prev_y * jnp.int16(16)
            else:
                packed = prev_m | (prev_x << 2) | (prev_y << 4)
            tb_ref[0, r, pl.ds(coff, tbp // nchain), :] = packed.astype(jnp.uint8)

        if nomask:
            rbv = jm(rbv, val_m)
        else:
            # baseline masking (lengths==padded here, mask vs constants)
            in_range = jl < mp
            masked = jnp.where(in_range, val_m, NEGv)
            rbv = jm(rbv, masked)
        return val_m, val_x, val_y, rbv

    def group_step(g, _):
        states = []
        for c in range(nchain):
            sl = slice(c * (tbp // nchain), (c + 1) * (tbp // nchain))
            states.append([_ld(cm, sl), _ld(cx, sl), _ld(cy, sl),
                           _ld(runbest, sl)])
        for q in range(R):
            r = g * R + q
            srows = []
            for c in range(nchain):
                sl = slice(c * (tbp // nchain), (c + 1) * (tbp // nchain))
                srows.append(s_ref[0, r, sl, :].astype(dt))
            for c in range(nchain):
                Mp, Xp, Yp, rbv = states[c]
                states[c] = list(one_row(
                    r, Mp, Xp, Yp, rbv, srows[c], c * (tbp // nchain)
                ))
        for c in range(nchain):
            sl = slice(c * (tbp // nchain), (c + 1) * (tbp // nchain))
            _st(cm, sl, states[c][0])
            _st(cx, sl, states[c][1])
            _st(cy, sl, states[c][2])
            _st(runbest, sl, states[c][3])
        return 0

    assert rb_rows % R == 0 and rb_rows // R > 0, (rb_rows, R)
    jax.lax.fori_loop(0, rb_rows // R, group_step, 0, unroll=False)

    @pl.when(rb == n_row_blocks - 1)
    def _finish():
        # Mosaic: no int16 reductions — widen first (once, off the hot loop)
        gmax = jnp.max(
            _ld(runbest, slice(None)).astype(jnp.float32), axis=1,
            keepdims=True,
        )
        # bump (an SMEM scalar fed from the previous chain iteration's
        # output) serializes back-to-back executions for honest timing
        stats_ref[0, :, :] = jnp.broadcast_to(gmax, (tbp, 8)) + bump_ref[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "og", "eg", "R", "fuse_max3", "nomask", "fake_cummax", "nchain",
        "traceback", "rb_rows", "i16", "selmax", "ptrfast", "detrend",
        "ptreq", "xscan", "i16store", "tbdrop", "bareroll", "interpret",
        "return_tb",
    ),
)
def lab_fill(
    S, bump, *, og, eg, R, fuse_max3, nomask, fake_cummax, nchain, traceback,
    rb_rows, i16=False, selmax=False, ptrfast=False, detrend=False,
    ptreq=False, xscan=False, i16store=False, tbdrop=None,
    bareroll=False, interpret=False, return_tb=False,
):
    G, NP, tbp, MP = S.shape
    n_row_blocks = NP // rb_rows
    if ptrfast:
        assert fuse_max3 and not i16, "ptrfast needs fused values, f32 domain"
    kernel = functools.partial(
        _lab_kernel,
        og=og, eg=eg, rb_rows=rb_rows, tbp=tbp, mp=MP,
        n_row_blocks=n_row_blocks, R=R, fuse_max3=fuse_max3, nomask=nomask,
        fake_cummax=fake_cummax, nchain=nchain, traceback=traceback, i16=i16,
        selmax=selmax, ptrfast=ptrfast, detrend=detrend, ptreq=ptreq,
        xscan=xscan, i16store=i16store, tbdrop=tbdrop,
        bareroll=bareroll,
    )
    if traceback:
        def kfn(bump_ref, s_ref, tb_ref, stats_ref, cm, cx, cy, runbest):
            kernel(bump_ref, s_ref, stats_ref, cm, cx, cy, runbest,
                   tb_ref=tb_ref)
    else:
        def kfn(bump_ref, s_ref, stats_ref, cm, cx, cy, runbest):
            kernel(bump_ref, s_ref, stats_ref, cm, cx, cy, runbest)

    in_specs = [
        pl.BlockSpec((1, 1), lambda ib, rb: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, rb_rows, tbp, MP), lambda ib, rb: (ib, rb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    stats_shape = jax.ShapeDtypeStruct((G, tbp, 8), jnp.float32)
    stats_spec = pl.BlockSpec((1, tbp, 8), lambda ib, rb: (ib, 0, 0),
                              memory_space=pltpu.VMEM)
    sdt = jnp.int16 if (i16 or i16store) else jnp.float32
    scratch = [
        pltpu.VMEM((tbp, MP), sdt),
        pltpu.VMEM((tbp, MP), sdt),
        pltpu.VMEM((tbp, MP), sdt),
        pltpu.VMEM((tbp, MP), sdt),
    ]
    cp = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((G, NP, tbp, MP), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (1, rb_rows, tbp, MP), lambda ib, rb: (ib, rb, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tb, stats = pl.pallas_call(
            kfn, grid=(G, n_row_blocks), in_specs=in_specs,
            out_shape=(tb_shape, stats_shape),
            out_specs=(tb_spec, stats_spec),
            scratch_shapes=scratch, compiler_params=cp, interpret=interpret,
        )(bump, S)
        return (tb, stats) if return_tb else stats
    stats = pl.pallas_call(
        kfn, grid=(G, n_row_blocks), in_specs=in_specs,
        out_shape=stats_shape, out_specs=stats_spec,
        scratch_shapes=scratch, compiler_params=cp, interpret=interpret,
    )(bump, S)
    return stats


def bench_variant(name, S, ncall=16, **kw):
    """Honest chained timing: each call consumes a zero derived from the
    previous call's output (the tunnel caches identical executions)."""
    B = S.shape[0] * S.shape[2]
    NP, MP = S.shape[1], S.shape[3]

    @jax.jit
    def chain(S0, b0):
        def body(bump, _):
            stats = lab_fill(S0, bump, **kw)
            nb = (stats[0:1, 0:1, 0] * 0.0) + b0
            return nb, stats[0, 0, 0]
        _, scores = jax.lax.scan(body, b0, None, length=ncall)
        return scores

    # vary b0 per call (the axon tunnel caches identical (program, args)
    # executions) and force a device->host value read per timed call
    # (block_until_ready returns early on the tunnel)
    r = chain(S, jnp.full((1, 1), 0.0, jnp.float32))
    float(np.asarray(r)[-1])
    dt = None
    for k in range(3):
        b0 = jnp.full((1, 1), float(k + 1) * 1e-6, jnp.float32)
        t0 = time.time()
        r = chain(S, b0)
        float(np.asarray(r)[-1])
        d = (time.time() - t0) / ncall
        dt = d if dt is None else min(dt, d)
    gcups = B * NP * MP / dt / 1e9
    print(json.dumps({"variant": name, "gcups": round(gcups, 2),
                      "ms_per_call": round(dt * 1e3, 2), **{
                          k: v for k, v in kw.items() if k != "og" and k != "eg"
                      }}), flush=True)
    return gcups


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    B, NP, MP = 512, 512, 512
    S_i8 = jnp.asarray(
        rng.integers(-4, 12, size=(B, NP, MP)).astype(np.int8)
    ).reshape(4, 128, NP, MP).transpose(0, 2, 1, 3)
    S_f32 = S_i8.astype(jnp.float32)

    # block sizes match production _row_block: ~1 MiB per S block
    base_i8 = dict(og=-10.0, eg=-0.5, R=4, fuse_max3=False, nomask=False,
                   fake_cummax=False, nchain=1, traceback=False, rb_rows=16)
    base = {**base_i8, "rb_rows": 4}  # f32

    want = sys.argv[1:] or [
        "base-i8", "base-f32", "fuse-f32", "nomask-f32", "fused-nomask-f32",
        "fakecummax-f32", "nchain2-f32", "nchain4-f32", "R8-f32", "R16-f32",
        "rb16-f32", "tb-base-i8", "tb-fused-f32",
    ]
    S128_i8 = S_i8
    variants = {
        "base-i8": (S128_i8, base_i8),
        "fuse-i8": (S128_i8, {**base_i8, "fuse_max3": True}),
        "R8-i8": (S128_i8, {**base_i8, "R": 8}),
        "R16-i8": (S128_i8, {**base_i8, "R": 16}),
        "fuseR8-i8": (S128_i8, {**base_i8, "fuse_max3": True, "R": 8}),
        "i16": (S128_i8, {**base_i8, "i16": True}),
        "i16-fuse": (S128_i8, {**base_i8, "i16": True, "fuse_max3": True}),
        "i16-R8": (S128_i8, {**base_i8, "i16": True, "R": 8}),
        "i16-fuse-R8": (
            S128_i8, {**base_i8, "i16": True, "fuse_max3": True, "R": 8}
        ),
        "i16-selmax": (S128_i8, {**base_i8, "i16": True, "selmax": True}),
        "i16-selmax-fuse-R8": (
            S128_i8,
            {**base_i8, "i16": True, "selmax": True, "fuse_max3": True,
             "R": 8},
        ),
        "tb-i16-selmax-fuse-R8": (
            S128_i8,
            {**base_i8, "i16": True, "selmax": True, "fuse_max3": True,
             "R": 8, "traceback": True},
        ),
        "f32-selmax-fuse-R8": (
            S128_i8,
            {**base_i8, "selmax": True, "fuse_max3": True, "R": 8},
        ),
        "i16-fuse-R16": (
            S128_i8, {**base_i8, "i16": True, "fuse_max3": True, "R": 16}
        ),
        "tb-i16": (S128_i8, {**base_i8, "i16": True, "traceback": True}),
        "tb-i16-fuse": (
            S128_i8,
            {**base_i8, "i16": True, "fuse_max3": True, "traceback": True},
        ),
        "tb-i16-fuse-R8": (
            S128_i8,
            {**base_i8, "i16": True, "fuse_max3": True, "R": 8,
             "traceback": True},
        ),
        "tb-fuseR8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True},
        ),
        "tb-ptrfast-R8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True},
        ),
        "tb-ptreq-R8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "ptreq": True},
        ),
        "detrend-fuseR8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "detrend": True},
        ),
        # workaround (b) A/B pair: f32 compute, i16 carry storage
        "i16store-detrend-fuseR8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "detrend": True,
             "i16store": True},
        ),
        "tb-xscan-i16store-R8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "i16store": True},
        ),
        "tb-ptrfast-detrend-R8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True},
        ),
        "tb-xscan-bareroll": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "bareroll": True},
        ),
        "tb-xscan-drop-override": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "tbdrop": "override"},
        ),
        "tb-xscan-drop-prevy": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "tbdrop": "prevy"},
        ),
        "tb-xscan-drop-prevm": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "tbdrop": "prevm"},
        ),
        "tb-xscan-drop-prevx": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "tbdrop": "prevx"},
        ),
        "tb-xscan-drop-store": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "tbdrop": "store"},
        ),
        "tb-xscan-drop-all": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True,
             "tbdrop": "all"},
        ),
        "tb-xscan-R8-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 8, "traceback": True,
             "ptrfast": True, "detrend": True, "xscan": True},
        ),
        "tb-ptrfast-detrend-R16-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 16, "traceback": True,
             "ptrfast": True, "detrend": True},
        ),
        "tb-ptrfast-R16-i8": (
            S128_i8,
            {**base_i8, "fuse_max3": True, "R": 16, "traceback": True,
             "ptrfast": True},
        ),
        "fuseR16-i8": (
            S128_i8, {**base_i8, "fuse_max3": True, "R": 16}
        ),
        "base-f32": (S_f32, base),
        "fuse-f32": (S_f32, {**base, "fuse_max3": True}),
        "nomask-f32": (S_f32, {**base, "nomask": True}),
        "fused-nomask-f32": (S_f32, {**base, "fuse_max3": True, "nomask": True}),
        "fakecummax-f32": (S_f32, {**base, "fake_cummax": True}),
        "nchain2-f32": (S_f32, {**base, "nchain": 2}),
        "nchain4-f32": (S_f32, {**base, "nchain": 4}),
        "nchain2-fused-f32": (S_f32, {**base, "nchain": 2, "fuse_max3": True}),
        "R8-f32": (S_f32, {**base, "R": 8}),
        "R16-f32": (S_f32, {**base, "R": 16}),
        "R2-f32": (S_f32, {**base, "R": 2}),
        "rb16-f32": (S_f32, {**base, "rb_rows": 16}),
        "tb-base-i8": (S128_i8, {**base_i8, "traceback": True}),
        "tb-base-f32": (S_f32, {**base, "traceback": True}),
        "tb-fused-f32": (S_f32, {**base, "fuse_max3": True, "traceback": True}),
        "tb-nchain2-f32": (S_f32, {**base, "nchain": 2, "traceback": True}),
    }
    # tile-width variants need a reshaped S
    for tile in (64, 256):
        G = B // tile
        St = S_f32.transpose(0, 2, 1, 3).reshape(B, NP, MP)
        St = St.reshape(G, tile, NP, MP).transpose(0, 2, 1, 3)
        rbt = max(1, (1 << 20) // (tile * MP * 4))
        rbt = 1 << (rbt.bit_length() - 1)
        variants[f"tile{tile}-f32"] = (St, {**base, "rb_rows": rbt})
        variants[f"tile{tile}-nchain2-f32"] = (
            St, {**base, "rb_rows": rbt, "nchain": 2}
        )

    for name in want:
        if name not in variants:
            print(f"unknown variant {name}", file=sys.stderr)
            continue
        S, kw = variants[name]
        try:
            bench_variant(name, S, **kw)
        except Exception as e:  # keep sweeping past a broken variant
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
