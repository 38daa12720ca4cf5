#!/usr/bin/env python3
"""Anti-diagonal (wavefront) DP kernel prototypes — perf lab.

The row kernel's X-state lane cummax (18 of ~31 wide ops/row) is only
mandated by ROW-MAJOR evaluation order: along an anti-diagonal i+j=d no
cell depends on another, so the whole scan disappears.  These variants
measure the step cost of a skewed-layout wavefront kernel:

  * state vectors live at (TBP pairs on sublanes, 128 strip columns on
    lanes); step d holds, at lane l, the states of cell (i=d-l, j0+l);
  * per step: val_y = max(T0, Y+eg), val_x = shift(max(T0, X+eg)),
    val_m = max(shift(W2)+s, 0), W = max3, with T0 = max(W1+og, 0)
    (LOCAL; the W+og folding is exact when og <= eg, since
    X+og <= X+eg makes max(W+og, X+eg) == max(max(M,Y)+og, X+eg));
  * S is consumed in skewed layout (G, NSTRIP, ND, TBP, 128) with
    ND = NP + 128 (the per-strip ramp: (NP+128)/NP overhead);
  * cross-strip carries ride a VMEM edge ring indexed by row, written
    as (TBP, R) slabs from lane-127 extractions, read as slabs for the
    lane-0 shift fills (variants with edges=False measure the pure core).

Perf only — exactness (boundary ramps, tie-breaks, argmax) is enforced
when the winner is ported into ops/pallas_dp.py.

Usage: python -u scripts/kernel_lab_diag.py [variant ...]
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
LW = 128  # strip width (lanes)


def _shift_right(v, fill):
    pad = jnp.broadcast_to(fill, v.shape[:-1] + (1,)).astype(v.dtype)
    return jnp.concatenate([pad, v[:, :-1]], axis=1)


def _diag_kernel(
    bump_ref, s_ref, stats_ref, cw1, cw2, cx, cy, cmm, runbest,
    edge_w, edge_x,
    *, og, eg, db, tbp, nd, n_db, nstrip, R, i16, selmax, edges, traceback,
    tb_ref=None,
):
    sid = pl.program_id(1)
    dbk = pl.program_id(2)
    if selmax:
        def jm(a, b):
            return jnp.where(a > b, a, b)
    else:
        jm = jnp.maximum
    if i16:
        dt = jnp.int16
        ogv, egv = jnp.int16(int(2 * og)), jnp.int16(int(2 * eg))
        sent = jnp.int16(-12000)
        NEGv = jnp.int16(-20000)
        zero = jnp.int16(0)
    else:
        dt = jnp.float32
        ogv, egv = jnp.float32(og), jnp.float32(eg)
        sent = jnp.float32(10.0 * og + 10.0 * eg)
        NEGv = jnp.float32(NEG)
        zero = jnp.float32(0.0)

    @pl.when((sid == 0) & (dbk == 0))
    def _init_best():
        runbest[:, :] = jnp.full((tbp, LW), NEGv, dt)

    @pl.when(dbk == 0)
    def _init_strip():
        # LOCAL row-0 boundary: W = X = 0 dominates (M = Y = sent)
        cw1[:, :] = jnp.zeros((tbp, LW), dt)
        cw2[:, :] = jnp.zeros((tbp, LW), dt)
        cx[:, :] = jnp.zeros((tbp, LW), dt)
        cy[:, :] = jnp.full((tbp, LW), sent, dt)
        if traceback:
            cmm[:, :] = jnp.full((tbp, LW), sent, dt)
        if edges:
            edge_w[:, :] = jnp.zeros((tbp, nd), dt)
            edge_x[:, :] = jnp.zeros((tbp, nd), dt)

    if i16:
        p0, p1, p2, p3 = (jnp.int16(v) for v in (0, 1, 2, 3))
    else:
        p0, p1, p2, p3 = 0, 1, 2, 3

    def one_step(q, qi, W1, W2, X1, Y1, M1, rbv, wacc, xacc, wfills, xfills):
        s = s_ref[0, 0, q, :, :].astype(dt)
        T0 = jm(W1 + ogv, zero)
        Ye = Y1 + egv
        val_y = jm(T0, Ye)
        Xe = X1 + egv
        xpre = jm(T0, Xe)
        if edges:
            fx = xfills[:, qi: qi + 1]
            fw = wfills[:, qi: qi + 1]
        else:
            fx = fw = NEGv
        val_x = _shift_right(xpre, fx)
        val_m = jm(_shift_right(W2, fw) + s, zero)
        W = jm(jm(val_m, val_x), val_y)
        rbv = jm(rbv, val_m)

        if traceback:
            # prev_m: from diag d-2 states, cmps unshifted then shift result
            m_ge_x = M1 >= X1  # NOTE lab: uses d-1 regs (perf-equal to d-2)
            m_ge_y = M1 >= Y1
            x_ge_y = X1 >= Y1
            pm = jnp.where(
                m_ge_x, jnp.where(m_ge_y, p0, p2), jnp.where(x_ge_y, p1, p2)
            )
            prev_m = _shift_right(pm, p3)
            Mo = M1 + ogv
            Xo = X1 + ogv
            c1 = Mo >= Ye
            c2 = M1 > X1
            c3 = Ye > Xo
            prev_y = jnp.where(c1, jnp.where(c2, p0, p1),
                               jnp.where(c3, p2, p1))
            d1 = Mo >= Xe
            d2 = M1 > Y1
            Yo = Y1 + ogv
            d3 = Xe > Yo
            px = jnp.where(d1, jnp.where(d2, p0, p2), jnp.where(d3, p1, p2))
            prev_x = _shift_right(px, p3)
            prev_m = jnp.where(val_m == zero, p3, prev_m)
            prev_x = jnp.where(val_x == zero, p3, prev_x)
            prev_y = jnp.where(val_y == zero, p3, prev_y)
            if i16:
                packed = prev_m + prev_x * jnp.int16(4) + prev_y * jnp.int16(16)
            else:
                packed = prev_m | (prev_x << 2) | (prev_y << 4)
            tb_ref[0, 0, q, :, :] = packed.astype(jnp.uint8)

        if edges:
            wacc.append(W[:, LW - 1: LW])
            xacc.append(val_x[:, LW - 1: LW])
        return W1, W, val_x, val_y, val_m, rbv

    def group_step(g, _):
        W1, W2 = cw1[:, :], cw2[:, :]
        X1, Y1 = cx[:, :], cy[:, :]
        M1 = cmm[:, :] if traceback else None
        rbv = runbest[:, :]
        if edges:
            off = g * R  # lab offset (production: exact row bookkeeping)
            wfills = edge_w[:, pl.ds(off, R)]
            xfills = edge_x[:, pl.ds(off, R)]
        else:
            wfills = xfills = None
        wacc, xacc = [], []
        for q in range(R):
            W2, W1, X1, Y1, M1, rbv = one_step(
                g * R + q, q, W1, W2, X1, Y1, M1, rbv, wacc, xacc,
                wfills, xfills,
            )
        cw1[:, :] = W1
        cw2[:, :] = W2
        cx[:, :] = X1
        cy[:, :] = Y1
        if traceback:
            cmm[:, :] = M1
        runbest[:, :] = rbv
        if edges:
            edge_w[:, pl.ds(off, R)] = jnp.concatenate(wacc, axis=1)
            edge_x[:, pl.ds(off, R)] = jnp.concatenate(xacc, axis=1)
        return 0

    jax.lax.fori_loop(0, db // R, group_step, 0, unroll=False)

    @pl.when((sid == nstrip - 1) & (dbk == n_db - 1))
    def _finish():
        gmax = jnp.max(runbest[:, :].astype(jnp.float32), axis=1,
                       keepdims=True)
        stats_ref[0, :, :] = jnp.broadcast_to(gmax, (tbp, 8)) + bump_ref[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("og", "eg", "R", "db", "i16", "selmax", "edges",
                     "traceback", "interpret"),
)
def diag_fill(S, bump, *, og, eg, R, db, i16, selmax, edges, traceback,
              interpret=False):
    G, nstrip, ND, tbp, lw = S.shape
    assert lw == LW and ND % db == 0
    n_db = ND // db
    kernel = functools.partial(
        _diag_kernel,
        og=og, eg=eg, db=db, tbp=tbp, nd=ND, n_db=n_db, nstrip=nstrip,
        R=R, i16=i16, selmax=selmax, edges=edges, traceback=traceback,
    )
    if traceback:
        def kfn(bump_ref, s_ref, tb_ref, stats_ref, *scr):
            kernel(bump_ref, s_ref, stats_ref, *scr, tb_ref=tb_ref)
    else:
        def kfn(bump_ref, s_ref, stats_ref, *scr):
            kernel(bump_ref, s_ref, stats_ref, *scr)

    in_specs = [
        pl.BlockSpec((1, 1), lambda g, s, d: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, db, tbp, LW), lambda g, s, d: (g, s, d, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    stats_shape = jax.ShapeDtypeStruct((G, tbp, 8), jnp.float32)
    stats_spec = pl.BlockSpec((1, tbp, 8), lambda g, s, d: (g, 0, 0),
                              memory_space=pltpu.VMEM)
    sdt = jnp.int16 if i16 else jnp.float32
    scratch = [
        pltpu.VMEM((tbp, LW), sdt),   # cw1
        pltpu.VMEM((tbp, LW), sdt),   # cw2
        pltpu.VMEM((tbp, LW), sdt),   # cx
        pltpu.VMEM((tbp, LW), sdt),   # cy
        pltpu.VMEM((tbp, LW), sdt),   # cmm
        pltpu.VMEM((tbp, LW), sdt),   # runbest
        pltpu.VMEM((tbp, ND), sdt),   # edge_w
        pltpu.VMEM((tbp, ND), sdt),   # edge_x
    ]
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary", "arbitrary"))
    if traceback:
        tb_shape = jax.ShapeDtypeStruct((G, nstrip, ND, tbp, LW), jnp.uint8)
        tb_spec = pl.BlockSpec(
            (1, 1, db, tbp, LW), lambda g, s, d: (g, s, d, 0, 0),
            memory_space=pltpu.VMEM)
        tb, stats = pl.pallas_call(
            kfn, grid=(G, nstrip, n_db), in_specs=in_specs,
            out_shape=(tb_shape, stats_shape),
            out_specs=(tb_spec, stats_spec),
            scratch_shapes=scratch, compiler_params=cp, interpret=interpret,
        )(bump, S)
        return stats
    stats = pl.pallas_call(
        kfn, grid=(G, nstrip, n_db), in_specs=in_specs,
        out_shape=stats_shape, out_specs=stats_spec,
        scratch_shapes=scratch, compiler_params=cp, interpret=interpret,
    )(bump, S)
    return stats


def bench_variant(name, S, NP, MP, ncall=16, **kw):
    G, nstrip, ND, tbp, lw = S.shape
    B = G * tbp

    @jax.jit
    def chain(S0, b0):
        def body(bump, _):
            stats = diag_fill(S0, bump, **kw)
            nb = (stats[0:1, 0:1, 0] * 0.0) + b0
            return nb, stats[0, 0, 0]
        _, scores = jax.lax.scan(body, b0, None, length=ncall)
        return scores

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
                      "ms_per_call": round(dt * 1e3, 2),
                      **{k: v for k, v in kw.items()
                         if k not in ("og", "eg")}}), flush=True)
    return gcups


def bench_skew_prep(B=512, NP=512, MP=512, tbp=128):
    """Cost of building skewed S from the row-layout S via XLA gather."""
    rng = np.random.default_rng(0)
    G = B // tbp
    S = jnp.asarray(rng.integers(-4, 12, size=(G, NP, tbp, MP), dtype=np.int64)
                    .astype(np.int8))
    nstrip = MP // LW
    ND = NP + LW

    @jax.jit
    def skew(S0):
        # out[g, k, d, p, l] = S0[g, d - l - 1, p, 128k + l] (pad elsewhere)
        Sp = jnp.pad(S0, ((0, 0), (LW + 1, 1), (0, 0), (0, 0)),
                     constant_values=-128)
        Ss = Sp.reshape(G, NP + LW + 2, tbp, nstrip, LW).transpose(
            0, 3, 1, 2, 4)  # (G, nstrip, NPpad, tbp, LW)
        d = jax.lax.broadcasted_iota(jnp.int32, (G, nstrip, ND, tbp, LW), 2)
        l = jax.lax.broadcasted_iota(jnp.int32, (G, nstrip, ND, tbp, LW), 4)
        idx = jnp.clip(d - l + LW, 0, NP + LW + 1)
        return jnp.take_along_axis(Ss, idx, axis=2)

    out = skew(S)
    out.block_until_ready()
    dt = None
    for k in range(3):
        Sk = jnp.asarray(np.asarray(S))  # fresh buffer vs tunnel cache
        t0 = time.time()
        out = skew(Sk)
        v = float(np.asarray(out[0, 0, 0, 0, 0]))
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    print(json.dumps({"variant": "skew-prep-gather", "ms": round(dt * 1e3, 2),
                      "note": f"{B}x{NP}x{MP} int8 -> skewed"}), flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    B, NP, MP = 512, 512, 512
    nstrip = MP // LW
    ND = NP + LW  # 640

    def make_S(tbp):
        G = B // tbp
        return jnp.asarray(
            rng.integers(-4, 12, size=(G, nstrip, ND, tbp, LW),
                         dtype=np.int64).astype(np.int8))

    S128 = make_S(128)
    S64 = make_S(64)

    base = dict(og=-10.0, eg=-0.5, R=8, db=128, i16=False, selmax=False,
                edges=False, traceback=False)
    variants = {
        "dg-f32": (S128, base),
        "dg-f32-t64": (S64, base),
        "dg-f32-R4": (S128, {**base, "R": 4}),
        "dg-f32-R16": (S128, {**base, "R": 16}),
        "dg-f32-edges": (S128, {**base, "edges": True}),
        "dg-f32-edges-t64": (S64, {**base, "edges": True}),
        "dg-i16": (S128, {**base, "i16": True}),
        "dg-i16-sel": (S128, {**base, "i16": True, "selmax": True}),
        "dg-i16-sel-edges": (
            S128, {**base, "i16": True, "selmax": True, "edges": True}),
        "dg-tb-f32": (S128, {**base, "traceback": True}),
        "dg-tb-f32-t64": (S64, {**base, "traceback": True}),
        "dg-tb-i16-sel": (
            S128, {**base, "i16": True, "selmax": True, "traceback": True}),
        "dg-tb-i16-sel-t64": (
            S64, {**base, "i16": True, "selmax": True, "traceback": True}),
    }
    want = sys.argv[1:] or [
        "dg-f32", "dg-f32-edges", "dg-i16-sel", "dg-i16-sel-edges",
        "dg-tb-f32", "dg-tb-i16-sel", "skew-prep",
    ]
    for name in want:
        if name == "skew-prep":
            try:
                bench_skew_prep()
            except Exception as e:
                print(json.dumps({"variant": name, "error": repr(e)[:300]}),
                      flush=True)
            continue
        if name not in variants:
            print(f"unknown variant {name}", file=sys.stderr)
            continue
        S, kw = variants[name]
        try:
            bench_variant(name, S, NP, MP, **kw)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
