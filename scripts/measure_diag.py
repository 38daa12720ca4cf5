#!/usr/bin/env python3
"""One-process TPU measurement: wavefront (diag) score kernel vs row kernel.

Decision measurement for the r2 wavefront experiment (ops/diag_dp.py):
the row kernel pays an 18-op lane cummax per row for the X state; the
anti-diagonal evaluation order removes it at the price of a skew gather
and a (NP+128)/NP ramp.  LOCAL score-only, headline shape.

Timing protocol (CLAUDE.md), RESIDENT-BUFFER VARIANT: the 2026-08-18
degradation window showed XLA elementwise/gather HBM streaming can be
~30-90x slow while Pallas fills and the MXU run at full speed — so a
chain that bumps the 134 MB S per iteration times the *degraded streaming
path*, not the kernel.  Here both chains keep S device-resident and
serialize through a tiny per-iteration input instead (row kernel: the nt
length array; diag kernel: its SMEM chain scalar — pallas_call is opaque
to XLA, so any changing input defeats loop-invariant hoisting), with a
fresh small buffer per timed call to defeat the tunnel's (program, args)
execution cache, a device->host VALUE read per call, min of 3.  The skew
gather is timed separately and reported as a per-call overhead line; it
is one HBM pass and is meaningful only outside a degradation window
(compare hbm_gbs below against ~800 healthy).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from smithwaterman_tpu.config import LOCAL
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.ops import batch, diag_dp, pallas_dp


def _force(x):
    return float(np.asarray(x).ravel()[-1])


def make_inputs(B, N):
    tile = pallas_dp.choose_tile(B, N)
    sm = SubstitutionMatrix.blosum62()
    rng = np.random.default_rng(0)
    codes1 = rng.integers(0, 20, size=(B, N)).astype(np.int32)
    codes2 = rng.integers(0, 20, size=(B, N)).astype(np.int32)
    lens = jnp.full(B, N, jnp.int32)
    S = batch.scores_tiled(
        jnp.asarray(sm.table), codes1, codes2, as_int8=True, tile=tile,
        n=lens, m=lens,
    )
    G = B // tile
    nt = jnp.full((G, tile, 1), N, jnp.int32)
    mt = jnp.full((G, tile, 1), N, jnp.int32)
    return S, nt, mt, tile


def hbm_probe():
    x = jnp.ones((16 * 1024 * 1024,), jnp.float32)

    @jax.jit
    def ew(x0):
        def body(c, _):
            return jnp.maximum(c * 1.0000001 + 0.5, c), c[0]
        _, out = jax.lax.scan(body, x0, None, length=64)
        return out

    _force(ew(x))
    t0 = time.time()
    _force(ew(x + 1.0))
    gbs = 64 / 1024 * 2 / ((time.time() - t0) / 64)
    print(f"hbm_gbs={gbs:.0f} (healthy v5e ~800)", flush=True)
    return gbs


def bench(B=512, N=512, ncall=32):
    S, nt, mt, tile = make_inputs(B, N)
    hbm_probe()

    # hardware bit-exactness first (direct calls)
    _, stats_row = pallas_dp.fill_tiled(
        S, nt, mt, mode=LOCAL, og=-10.0, eg=-0.5, score_only=True,
        masked_s=True,
    )
    stats_diag = diag_dp.fill_diag_scores(S, og=-10.0, eg=-0.5)
    a = np.asarray(stats_row)[:, :, 0]
    b = np.asarray(stats_diag)[:, :, 0]
    eq = bool(np.array_equal(a, b))
    print(f"scores bit-equal on TPU: {eq}"
          + ("" if eq else f"  max|d|={np.abs(a - b).max()}"), flush=True)

    S_sk = diag_dp.skew_scores(S)
    S_sk.block_until_ready()

    @jax.jit
    def chain_row(S0, nt0):
        def body(nmt, _):
            nt_c, mt_c = nmt
            _, stats = pallas_dp.fill_tiled(
                S0, nt_c, mt_c, mode=LOCAL, og=-10.0, eg=-0.5,
                score_only=True, masked_s=True,
            )
            bump = (stats[0, 0, 0] * 0.0).astype(jnp.int32)
            return (nt_c + bump, mt_c + bump), stats[0, 0, 0]
        _, out = jax.lax.scan(body, (nt0, mt), None, length=ncall)
        return out

    @jax.jit
    def chain_diag(Ssk0, ch0):
        def body(ch, _):
            stats = diag_dp.fill_diag_skewed(
                Ssk0, og=-10.0, eg=-0.5, chain=ch,
            )
            return ch + stats[0, 0, 0] * 0.0, stats[0, 0, 0]
        _, out = jax.lax.scan(body, ch0, None, length=ncall)
        return out

    def timed(fn, fresh):
        fn(fresh())  # warm/compile (fresh buffer so the timed call misses
        dt = None    # the tunnel's execution cache)
        for _ in range(3):
            arg = fresh()
            t0 = time.time()
            _force(fn(arg))
            d = (time.time() - t0) / ncall
            dt = d if dt is None else min(dt, d)
        return dt

    dt_row = timed(lambda a: chain_row(S, a),
                   lambda: jnp.asarray(np.asarray(nt)))
    g = B * N * N / dt_row / 1e9
    print(f"row  local so: {g:.1f} GCUPS ({dt_row*1e3:.2f} ms/call)",
          flush=True)

    dt_diag = timed(lambda a: chain_diag(S_sk, a),
                    lambda: jnp.zeros((1,), jnp.float32))
    g = B * N * N / dt_diag / 1e9
    print(f"diag local so: {g:.1f} GCUPS ({dt_diag*1e3:.2f} ms/call)"
          f"  [kernel only, excl. skew]", flush=True)

    # skew gather alone: chained on itself via a scalar bump (int8-safe)
    @jax.jit
    def chain_skew(S0, b0):
        def body(bmp, _):
            sk = diag_dp.skew_scores(S0 + bmp)
            nxt = (sk[0, 0, -1, 0, 0] * 0).astype(jnp.int8)
            return nxt, sk[0, 0, -1, 0, 0]
        _, out = jax.lax.scan(body, b0, None, length=8)
        return out

    chain_skew(S, jnp.int8(0))
    dts = None
    for _ in range(3):
        arg = jnp.asarray(np.asarray(np.int8(0)))
        t0 = time.time()
        _force(chain_skew(S, arg))
        d = (time.time() - t0) / 8
        dts = d if dts is None else min(dts, d)
    print(f"skew gather (incl. one S-wide bump add): {dts*1e3:.2f} ms/call",
          flush=True)
    tot = dt_diag + dts
    g = B * N * N / tot / 1e9
    print(f"diag local so incl. skew upper bound: {g:.1f} GCUPS"
          f" ({tot*1e3:.2f} ms/call)", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    bench()


if __name__ == "__main__":
    main()
