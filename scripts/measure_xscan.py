#!/usr/bin/env python3
"""One-process TPU measurement for the xscan change: production fill kernel
across modes/paths + longseq wall time (post dispatch-fusion) + banded
breakdown.  Honest timing (chained scan + device->host value read + fresh
input buffer per call)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

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
        ntk = jnp.asarray(np.asarray(nt))
        t0 = time.time()
        _force(chain(ntk, mt))
        d = (time.time() - t0) / ncall
        dt = d if dt is None else min(dt, d)
    return B * N * N / dt / 1e9, dt


MODES = {"local": LOCAL, "glocal": GLOCAL, "global": GLOBAL}
for mname, mode in MODES.items():
    for so in (False, True):
        g, dt = bench_fill(512, 512, mode, so)
        print(f"fill {mname} so={so}: {g:.1f} GCUPS ({dt*1e3:.2f} ms/call)",
              flush=True)

# ---- longseq end-to-end after dispatch fusion
sm = SubstitutionMatrix.blosum62()
rng = np.random.default_rng(1)
NL, ML = 8192, 4096
c1 = rng.integers(0, 20, size=(8, NL)).astype(np.int32)
c2 = rng.integers(0, 20, size=(8, ML)).astype(np.int32)
S = batch.scores_tiled(jnp.asarray(sm.table), c1, c2, as_int8=True, tile=8)
n = np.full(8, NL, np.int32)
m = np.full(8, ML, np.int32)
longseq.align_long(S, n, m, mode=LOCAL, og=-10.0, eg=-0.5)  # warm
t0 = time.time()
longseq.align_long(S, n, m, mode=LOCAL, og=-10.0, eg=-0.5)
print(f"longseq 8x{NL}x{ML}: {time.time()-t0:.3f} s", flush=True)

# ---- banded breakdown: scores / fill / walk
L = 12000
pairs = []
for _ in range(8):
    base = rng.integers(0, 20, size=L + 40).astype(np.int32)
    cc2 = base[20:L + 20].copy()
    mut = rng.integers(0, L, size=L // 20)
    cc2[mut] = rng.integers(0, 20, size=len(mut))
    pairs.append((base[:L], cc2))

t0 = time.time()
res = banded.align_banded_batch(
    pairs, sm.table, mode=LOCAL, og=-10.0, eg=-0.5, band=512
)
print(f"banded batch8 cold: {time.time()-t0:.3f} s", flush=True)
t0 = time.time()
res = banded.align_banded_batch(
    pairs, sm.table, mode=LOCAL, og=-10.0, eg=-0.5, band=512
)
print(f"banded batch8 warm: {time.time()-t0:.3f} s", flush=True)

# piecewise: time the fill alone and the walk alone via internal calls
import cProfile
import pstats

pr = cProfile.Profile()
pr.enable()
banded.align_banded_batch(
    pairs, sm.table, mode=LOCAL, og=-10.0, eg=-0.5, band=512
)
pr.disable()
st = pstats.Stats(pr)
st.sort_stats("cumulative")
st.print_stats(18)
