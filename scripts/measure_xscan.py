#!/usr/bin/env python3
"""One-process TPU measurement: production fill kernel across modes/paths
+ longseq and banded end-to-end wall time.

Timing protocol (CLAUDE.md): chained scan + device->host value read +
fresh input buffer per timed call, min of 3.  For the end-to-end paths
the timed call gets ITS OWN device S buffer (a warm-then-retime on the
same buffers lets the axon tunnel serve cached executions); the banded
path takes numpy inputs and uploads fresh buffers internally each call.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from smithwaterman_tpu.config import GLOBAL, GLOCAL, LOCAL
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.ops import banded, batch, longseq, pallas_dp


def _force(x):
    return float(np.asarray(x).ravel()[0])


def bench_fill(B, N, mode, score_only, ncall=32):
    tile = pallas_dp.choose_tile(B, N)
    sm = SubstitutionMatrix.blosum62()
    rng = np.random.default_rng(0)
    codes1 = rng.integers(0, 20, size=(B, N)).astype(np.int32)
    codes2 = rng.integers(0, 20, size=(B, N)).astype(np.int32)
    masked_s = mode == LOCAL
    lens = jnp.full(B, N, jnp.int32) if masked_s else None
    S = batch.scores_tiled(
        jnp.asarray(sm.table), codes1, codes2, as_int8=True, tile=tile,
        n=lens, m=lens,
    )
    G = B // tile
    nt = jnp.full((G, tile, 1), N, jnp.int32)
    mt = jnp.full((G, tile, 1), N, jnp.int32)

    @jax.jit
    def chain(nt0, mt0):
        def body(nm, _):
            nt_c, mt_c = nm
            tb, stats = pallas_dp.fill_tiled(
                S, nt_c, mt_c, mode=mode, og=-10.0, eg=-0.5,
                score_only=score_only, masked_s=masked_s,
            )
            bump = (stats[0, 0, 0] * 0.0).astype(jnp.int32)
            return (nt_c + bump, mt_c + bump), stats[0, 0, 0]
        _, out = jax.lax.scan(body, (nt0, mt0), None, length=ncall)
        return out

    _force(chain(nt, mt))
    dt = None
    for _ in range(3):
        ntk = jnp.asarray(np.asarray(nt))  # fresh device buffer
        t0 = time.time()
        _force(chain(ntk, mt))
        d = (time.time() - t0) / ncall
        dt = d if dt is None else min(dt, d)
    return B * N * N / dt / 1e9, dt


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    for mname, mode in (("local", LOCAL), ("glocal", GLOCAL),
                        ("global", GLOBAL)):
        for so in (False, True):
            g, dt = bench_fill(512, 512, mode, so)
            print(f"fill {mname} so={so}: {g:.1f} GCUPS "
                  f"({dt*1e3:.2f} ms/call)", flush=True)

    # ---- longseq end-to-end (dispatch-fused traceback)
    sm = SubstitutionMatrix.blosum62()
    rng = np.random.default_rng(1)
    NL, ML = 8192, 4096
    c1 = rng.integers(0, 20, size=(8, NL)).astype(np.int32)
    c2 = rng.integers(0, 20, size=(8, ML)).astype(np.int32)
    n = np.full(8, NL, np.int32)
    m = np.full(8, ML, np.int32)
    tab = jnp.asarray(sm.table)
    S_warm = batch.scores_tiled(tab, c1, c2, as_int8=True, tile=8)
    longseq.align_long(S_warm, n, m, mode=LOCAL, og=-10.0, eg=-0.5)  # warm
    dt = None
    for _ in range(2):
        Sk = batch.scores_tiled(tab, c1, c2, as_int8=True, tile=8)
        jax.block_until_ready(Sk)  # distinct buffer, same values
        t0 = time.time()
        longseq.align_long(Sk, n, m, mode=LOCAL, og=-10.0, eg=-0.5)
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    print(f"longseq 8x{NL}x{ML}: {dt:.3f} s", flush=True)

    # ---- banded end-to-end (numpy inputs -> fresh uploads per call)
    L = 12000
    pairs = []
    for _ in range(8):
        base = rng.integers(0, 20, size=L + 40).astype(np.int32)
        cc2 = base[20:L + 20].copy()
        mut = rng.integers(0, L, size=L // 20)
        cc2[mut] = rng.integers(0, 20, size=len(mut))
        pairs.append((base[:L], cc2))
    banded.align_banded_batch(pairs, sm.table, mode=LOCAL, og=-10.0,
                              eg=-0.5, band=512)  # warm
    dt = None
    for _ in range(2):
        t0 = time.time()
        banded.align_banded_batch(pairs, sm.table, mode=LOCAL, og=-10.0,
                                  eg=-0.5, band=512)
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    print(f"banded batch8 warm: {dt:.3f} s", flush=True)


if __name__ == "__main__":
    main()
