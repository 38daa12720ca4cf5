#!/usr/bin/env python3
"""A/B: index walk_bundle vs packed walk vs packed-with-i32-accumulation.

Phase probe r4 found non-local warm gather 0.65-0.74 s with the packed
walk vs ~0.18 s total in r3 (index bundle) — the walk program itself got
slower.  Suspect: the per-step (Lp, B) uint8 row scatter (sub-word
stores).  This times the three variants on one 512^2 global bucket,
value-read timing, fresh inputs per call.

Usage: python -u scripts/packed_walk_ab.py [--pairs 512] [--len 512]
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from smithwaterman_tpu.config import GLOBAL, LOCAL
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.ops import batch as batch_ops
from smithwaterman_tpu.ops import device_walk
from smithwaterman_tpu.ops.device_walk import (
    _walk_ctx, _walk_starts, _walk_step, SENTINEL)


@partial(jax.jit, static_argnames=("mode", "L"))
def walk_packed_i32(tb, stats, n, m, *, mode: int, L: int):
    """walk_bundle_packed with int32 in-loop accumulation; packs to u8
    after the loop."""
    G, NP, T, MP = tb.shape
    B = G * T
    local = mode == LOCAL
    st, i0, j0, s0, done0 = _walk_starts(stats, n, m, mode)
    Lp = -(-L // 4) * 4
    out_s = jnp.zeros((Lp, B), jnp.int32)
    cnt0 = jnp.zeros((B,), jnp.int32)
    ctx = _walk_ctx(tb)

    def cond(c):
        step, done = c[0], c[4]
        return (step < L) & jnp.any(~done)

    def body(c):
        step, i, j, s, done, cnt, o = c
        emit, s, _, _, ni, nj, ns, ndone = _walk_step(
            ctx, step, i, j, s, done, local=local
        )
        o = jax.lax.dynamic_update_index_in_dim(
            o, jnp.where(emit, s, 0), step, 0)
        return step + 1, ni, nj, ns, ndone, cnt + emit, o

    _, _, _, _, _, cnt, out_s = jax.lax.while_loop(
        cond, body, (jnp.int32(0), i0, j0, s0, done0, cnt0, out_s)
    )
    r = out_s.reshape(Lp // 4, 4, B)
    moves = (r[:, 0] | (r[:, 1] << 2) | (r[:, 2] << 4)
             | (r[:, 3] << 6)).astype(jnp.uint8)
    return st[:, :8].astype(jnp.float32), cnt, moves


@partial(jax.jit, static_argnames=("mode", "L"))
def walk_index_unroll2(tb, stats, n, m, *, mode: int, L: int):
    """walk_bundle with TWO steps per while iteration (same semantics:
    done pairs emit nothing), to amortize per-iteration overhead."""
    G, NP, T, MP = tb.shape
    B = G * T
    local = mode == LOCAL
    st, i0, j0, s0, done0 = _walk_starts(stats, n, m, mode)
    Lh = -(-L // 2)
    out1 = jnp.full((2 * Lh, B), SENTINEL, jnp.int32)
    out2 = jnp.full((2 * Lh, B), SENTINEL, jnp.int32)
    ctx = _walk_ctx(tb)

    def cond(c):
        step, done = c[0], c[4]
        return (step < Lh) & jnp.any(~done)

    def body(c):
        step, i, j, s, done, o1, o2 = c
        for k in range(2):
            emit, s, r1, r2, i, j, ns, done = _walk_step(
                ctx, step, i, j, s, done, local=local
            )
            o1 = jax.lax.dynamic_update_index_in_dim(
                o1, jnp.where(emit, r1, SENTINEL), 2 * step + k, 0)
            o2 = jax.lax.dynamic_update_index_in_dim(
                o2, jnp.where(emit, r2, SENTINEL), 2 * step + k, 0)
            s = ns
        return step + 1, i, j, s, done, o1, o2

    _, _, _, _, _, out1, out2 = jax.lax.while_loop(
        cond, body, (jnp.int32(0), i0, j0, s0, done0, out1, out2)
    )
    idx = jnp.stack([out1, out2])
    if max(NP, MP) < 2**15:
        idx = idx.astype(jnp.int16)
    return st[:, :8].astype(jnp.float32), idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=512)
    ap.add_argument("--len", dest="slen", type=int, default=512)
    ap.add_argument("--mode", default="global")
    args = ap.parse_args()

    mode = {"global": GLOBAL, "local": LOCAL}[args.mode]
    print(f"backend={jax.default_backend()} mode={args.mode}", flush=True)
    sm = SubstitutionMatrix.blosum62()
    tab = jnp.asarray(np.asarray(sm.table, np.float32))
    rng = np.random.default_rng(0)
    B, N = args.pairs, args.slen
    n = np.full(B, N, np.int32)
    m = np.full(B, N, np.int32)
    L = device_walk.max_path_len(N, N)

    def fill(c1, c2, tile):
        S = batch_ops.scores_tiled(tab, c1, c2, as_int8=True, tile=tile)
        return batch_ops.fill_pallas_dev(
            S, n, m, mode=mode, og=-10.0, eg=-0.5, score_only=False,
            interpret=False, masked_s=mode == LOCAL,
        )

    from smithwaterman_tpu.ops.pallas_dp import choose_tile

    tile = choose_tile(B, N)
    variants = {
        "index_bundle": lambda tb, stx: device_walk.walk_bundle(
            tb, stx, jnp.asarray(n), jnp.asarray(m), mode=mode, L=L),
        "packed_u8": lambda tb, stx: device_walk.walk_bundle_packed(
            tb, stx, jnp.asarray(n), jnp.asarray(m), mode=mode, L=L),
        "packed_i32": lambda tb, stx: walk_packed_i32(
            tb, stx, jnp.asarray(n), jnp.asarray(m), mode=mode, L=L),
        "index_unroll2": lambda tb, stx: walk_index_unroll2(
            tb, stx, jnp.asarray(n), jnp.asarray(m), mode=mode, L=L),
    }
    for name, walk in variants.items():
        times = []
        for rep in range(4):
            c1 = rng.integers(0, 20, size=(B, N)).astype(np.int32)
            c2 = rng.integers(0, 20, size=(B, N)).astype(np.int32)
            tb, stx = fill(c1, c2, tile)
            out = walk(tb, stx)
            jax.block_until_ready(out)
            # fresh fill for the timed leg; time walk dispatch->value-read
            c1b = rng.integers(0, 20, size=(B, N)).astype(np.int32)
            tb2, stx2 = fill(c1b, c2, tile)
            jax.block_until_ready((tb2, stx2))
            t0 = time.time()
            out2 = walk(tb2, stx2)
            for a in out2:
                np.asarray(a.reshape(-1)[-1])
            times.append(time.time() - t0)
        print(f"{name}: min={min(times[1:]):.4f}s all={[round(t,4) for t in times]}",
              flush=True)


if __name__ == "__main__":
    main()
