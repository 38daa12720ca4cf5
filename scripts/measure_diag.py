#!/usr/bin/env python3
"""One-process TPU measurement: wavefront (diag) score kernel vs row kernel.

Decision measurement for the r2 wavefront experiment (ops/diag_dp.py):
the row kernel pays an 18-op lane cummax per row for the X state; the
anti-diagonal evaluation order removes it at the price of a skew gather
and a (NP+128)/NP ramp.  LOCAL score-only, headline shape.

Timing protocol (CLAUDE.md): chained scan + device->host value read +
fresh input buffer per timed call, min of 3.  BOTH chains carry the same
in-chain S + bump add (one elementwise pass over S) so the comparison is
apples-to-apples; the diag chain additionally includes its skew gather —
that cost is intrinsic to the path.  Also checks bit-exact equality of
the two kernels' best scores on hardware.
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


def bench(B=512, N=512, ncall=32):
    S, nt, mt, tile = make_inputs(B, N)

    @jax.jit
    def chain_row(S0):
        def body(bump, _):
            Sb = S0 + bump
            _, stats = pallas_dp.fill_tiled(
                Sb, nt, mt, mode=LOCAL, og=-10.0, eg=-0.5,
                score_only=True, masked_s=True,
            )
            return (stats[0, 0, 0] * 0.0).astype(jnp.int8), stats[0, 0, 0]
        _, out = jax.lax.scan(body, jnp.int8(0), None, length=ncall)
        return out

    @jax.jit
    def chain_diag(S0):
        def body(bump, _):
            Sb = S0 + bump
            stats = diag_dp.fill_diag_scores(Sb, og=-10.0, eg=-0.5)
            return (stats[0, 0, 0] * 0.0).astype(jnp.int8), stats[0, 0, 0]
        _, out = jax.lax.scan(body, jnp.int8(0), None, length=ncall)
        return out

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

    for name, chain in (("row", chain_row), ("diag", chain_diag)):
        _force(chain(S))  # warm/compile
        dt = None
        for _ in range(3):
            Sk = jnp.asarray(np.asarray(S))  # fresh device buffer
            t0 = time.time()
            _force(chain(Sk))
            d = (time.time() - t0) / ncall
            dt = d if dt is None else min(dt, d)
        g = B * N * N / dt / 1e9
        print(f"{name} local so: {g:.1f} GCUPS ({dt*1e3:.2f} ms/call)",
              flush=True)

    # skew gather alone (fresh buffer per call, value read)
    @jax.jit
    def chain_skew(S0):
        def body(bump, _):
            sk = diag_dp.skew_scores(S0 + bump)
            return sk[0, 0, 0, 0, 0] * 0, sk[0, 0, -1, 0, 0]
        _, out = jax.lax.scan(body, jnp.int8(0), None, length=ncall)
        return out

    _force(chain_skew(S))
    dt = None
    for _ in range(3):
        Sk = jnp.asarray(np.asarray(S))
        t0 = time.time()
        _force(chain_skew(Sk))
        d = (time.time() - t0) / ncall
        dt = d if dt is None else min(dt, d)
    print(f"skew gather (in-chain, incl. bump add): {dt*1e3:.2f} ms/call",
          flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    bench()


if __name__ == "__main__":
    main()
