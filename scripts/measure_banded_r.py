#!/usr/bin/env python3
"""TPU: banded component timing (scores / fill / walk) + R=8 vs R=16 A/B
on the post-xscan LOCAL traceback kernel (same process, so comparable)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() == "tpu", jax.default_backend()

from smithwaterman_tpu.config import LOCAL
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.ops import banded, batch, pallas_dp


def _force(x):
    return float(np.asarray(x).ravel()[0])


def bench_fill(B, N, score_only, ncall=32):
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

    @jax.jit
    def chain(nt0, mt0):
        def body(nm, _):
            nt_c, mt_c = nm
            tb, stats = pallas_dp.fill_tiled(
                S, nt_c, mt_c, mode=LOCAL, og=-10.0, eg=-0.5,
                score_only=score_only, masked_s=True,
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
    return B * N * N / dt / 1e9


for R in (8, 16, 32):
    pallas_dp._MAX_R = R
    for so in (False, True):
        g = bench_fill(512, 512, so)
        print(f"R={R} local so={so}: {g:.1f} GCUPS", flush=True)
pallas_dp._MAX_R = 8

# ---- banded component timing
sm = SubstitutionMatrix.blosum62()
rng = np.random.default_rng(1)
L = 12000
pairs = []
for _ in range(8):
    base = rng.integers(0, 20, size=L + 40).astype(np.int32)
    cc2 = base[20:L + 20].copy()
    mut = rng.integers(0, L, size=L // 20)
    cc2[mut] = rng.integers(0, 20, size=len(mut))
    pairs.append((base[:L], cc2))

import smithwaterman_tpu.ops.banded as bd

orig_scores = bd._banded_scores
orig_fill = bd.fill_banded
orig_walk = bd._walk_banded_device
times = {}


def wrap(name, fn):
    def inner(*a, **k):
        t0 = time.time()
        r = fn(*a, **k)
        jax.block_until_ready(r)
        r0 = np.asarray(r[0] if isinstance(r, tuple) else r)
        _ = r0.ravel()[:1]
        times[name] = times.get(name, 0.0) + (time.time() - t0)
        return r
    return inner


bd.align_banded_batch(pairs, sm.table, mode=LOCAL, og=-10.0, eg=-0.5,
                      band=512)  # warm
bd._banded_scores = wrap("scores", orig_scores)
bd.fill_banded = wrap("fill", orig_fill)
bd._walk_banded_device = wrap("walk", orig_walk)
t0 = time.time()
bd.align_banded_batch(pairs, sm.table, mode=LOCAL, og=-10.0, eg=-0.5,
                      band=512)
total = time.time() - t0
print(f"banded batch8 warm total: {total:.3f} s, components: "
      f"{ {k: round(v, 3) for k, v in times.items()} }", flush=True)
