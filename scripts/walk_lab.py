#!/usr/bin/env python3
"""Bisect the device walk's per-iteration cost on TPU.

The walk while_loop costs ~100-140 us/iter at suite shapes (B=128,
L~1026) — ~10x the raw loop+gather floor — and it now dominates suite
wall time.  This times a ladder of loop bodies from bare counter to the
full walk body, value-read timing, fresh inputs per rep.

Usage: python -u scripts/walk_lab.py [--pairs 128] [--len 512]
"""

import argparse
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from smithwaterman_tpu.config import CELL_GAPINX, CELL_GAPINY, CELL_MATCH, CELL_STOP


def timed(fn, args_fn, reps=4):
    ts = []
    for r in range(reps):
        a = args_fn(r)
        out = fn(*a)
        jax.block_until_ready(out)
        a2 = args_fn(100 + r)
        jax.block_until_ready(a2)
        t0 = time.time()
        out = fn(*a2)
        leaves = jax.tree_util.tree_leaves(out)
        for x in leaves:
            np.asarray(x.reshape(-1)[-1])
        ts.append(time.time() - t0)
    return min(ts[1:])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=128)
    ap.add_argument("--len", dest="slen", type=int, default=512)
    args = ap.parse_args()
    B, N = args.pairs, args.slen
    L = 2 * N + 2
    NPAD = N
    print(f"backend={jax.default_backend()} B={B} N={N} L={L}", flush=True)
    rng = np.random.default_rng(0)

    def fresh_tb(r):
        return jnp.asarray(
            rng.integers(0, 255, size=(1, NPAD, B, NPAD), dtype=np.uint8))

    iv = jnp.arange(B, dtype=jnp.int32)

    # 1. bare counter loop
    @jax.jit
    def bare(tb):
        def body(c):
            return c[0] + 1, c[1] + 1
        return jax.lax.while_loop(lambda c: c[0] < L, body,
                                  (jnp.int32(0), iv))[1]

    # 2. + dependent gather from tb
    @jax.jit
    def gather(tb):
        flat = tb.reshape(-1)
        M = flat.shape[0]
        def body(c):
            i, ix = c
            v = flat[ix].astype(jnp.int32)
            return i + 1, (ix + v + 13) % M
        return jax.lax.while_loop(lambda c: c[0] < L, body,
                                  (jnp.int32(0), iv))[1]

    # 3. + one (L, B) i32 row write per iter
    @jax.jit
    def gather_write1(tb):
        flat = tb.reshape(-1)
        M = flat.shape[0]
        o0 = jnp.zeros((L, B), jnp.int32)
        def body(c):
            i, ix, o = c
            v = flat[ix].astype(jnp.int32)
            o = jax.lax.dynamic_update_index_in_dim(o, v, i, 0)
            return i + 1, (ix + v + 13) % M, o
        return jax.lax.while_loop(lambda c: c[0] < L, body,
                                  (jnp.int32(0), iv, o0))[2]

    # 4. + two row writes
    @jax.jit
    def gather_write2(tb):
        flat = tb.reshape(-1)
        M = flat.shape[0]
        o0 = jnp.zeros((L, B), jnp.int32)
        def body(c):
            i, ix, o, p = c
            v = flat[ix].astype(jnp.int32)
            o = jax.lax.dynamic_update_index_in_dim(o, v, i, 0)
            p = jax.lax.dynamic_update_index_in_dim(p, v + 1, i, 0)
            return i + 1, (ix + v + 13) % M, o, p
        return jax.lax.while_loop(lambda c: c[0] < L, body,
                                  (jnp.int32(0), iv, o0, o0))[2]

    # 5. walk arithmetic, no output writes
    @jax.jit
    def walk_noout(tb):
        G, NP, T, MP = tb.shape
        flat = tb.reshape(-1)
        g = iv // T
        t = iv % T
        i = jnp.full((B,), NP, jnp.int32)
        j = jnp.full((B,), MP, jnp.int32)
        s = jnp.zeros((B,), jnp.int32)
        done = jnp.zeros((B,), bool)
        def cond(c):
            return (c[0] < L) & jnp.any(~c[4])
        def body(c):
            step, i, j, s, done = c
            s = jnp.where((j == 0) & (i > 0), CELL_GAPINY,
                          jnp.where((i == 0) & (j > 0), CELL_GAPINX, s))
            interior = (i >= 1) & (j >= 1)
            ii = jnp.clip(i - 1, 0, NP - 1)
            jj = jnp.clip(j - 1, 0, MP - 1)
            ptr = flat[((g * NP + ii) * T + t) * MP + jj].astype(jnp.int32)
            prev_in = (ptr >> (2 * s)) & 3
            origin = (i == 0) & (j == 0)
            row0 = (i == 0) & (j > 0)
            bstate = jnp.where(origin, CELL_MATCH,
                               jnp.where(row0, CELL_GAPINX, CELL_GAPINY))
            prev = jnp.where(interior, prev_in, bstate)
            emit = ~done
            ni = jnp.where(emit & (s != CELL_GAPINX), i - 1, i)
            nj = jnp.where(emit & (s != CELL_GAPINY), j - 1, j)
            ns = jnp.where(emit, prev, s)
            ndone = done | ((ni == 0) & (nj == 0))
            return step + 1, ni, nj, ns, ndone
        return jax.lax.while_loop(cond, body,
                                  (jnp.int32(0), i, j, s, done))[1]

    # 6. the real walk (index bundle)
    from smithwaterman_tpu.ops import device_walk

    @partial(jax.jit, static_argnames=())
    def real_walk(tb):
        G, NP, T, MP = tb.shape
        stats = jnp.zeros((G, T, 8), jnp.float32)
        n = jnp.full((B,), NP, jnp.int32)
        m = jnp.full((B,), MP, jnp.int32)
        return device_walk.walk_bundle(tb, stats, n, m, mode=0, L=L)

    for name, fn in [("bare", bare), ("gather", gather),
                     ("gather+1write", gather_write1),
                     ("gather+2write", gather_write2),
                     ("walk-arith-noout", walk_noout),
                     ("real-walk-global", real_walk)]:
        dt = timed(fn, lambda r: (fresh_tb(r),))
        print(f"{name}: {dt*1000:.1f} ms  ({dt/L*1e6:.1f} us/iter)",
              flush=True)


def deep_bisect(B=128, N=512):
    """Second-stage bisect: start from the real _walk_step body and strip
    pieces (run with --deep)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from smithwaterman_tpu.ops.device_walk import (
        SENTINEL, _walk_ctx, _walk_step)

    L = 2 * N + 2
    rng = np.random.default_rng(0)

    def fresh_tb(r):
        return jnp.asarray(
            rng.integers(0, 255, size=(1, N, B, N), dtype=np.uint8))

    def runner(with_writes, with_walkstep):
        @jax.jit
        def fn(tb):
            G, NP, T, MP = tb.shape
            i = jnp.full((B,), NP, jnp.int32)
            j = jnp.full((B,), MP, jnp.int32)
            s = jnp.zeros((B,), jnp.int32)
            done = jnp.zeros((B,), bool)
            o1 = jnp.full((L, B), SENTINEL, jnp.int32)
            o2 = jnp.full((L, B), SENTINEL, jnp.int32)
            ctx = _walk_ctx(tb)

            def cond(c):
                return (c[0] < L) & jnp.any(~c[4])

            def body(c):
                step, i, j, s, done, o1, o2 = c
                emit, s2, r1, r2, ni, nj, ns, ndone = _walk_step(
                    ctx, step, i, j, s, done, local=False)
                if with_writes:
                    o1 = jax.lax.dynamic_update_index_in_dim(
                        o1, jnp.where(emit, r1, SENTINEL), step, 0)
                    o2 = jax.lax.dynamic_update_index_in_dim(
                        o2, jnp.where(emit, r2, SENTINEL), step, 0)
                return step + 1, ni, nj, ns, ndone, o1, o2

            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), i, j, s, done, o1, o2))
            return out[1], out[5]
        return fn

    for name, fn in [
        ("walkstep+writes", runner(True, True)),
        ("walkstep-nowrites", runner(False, True)),
    ]:
        dt = timed(fn, lambda r: (fresh_tb(r),))
        print(f"{name}: {dt*1000:.1f} ms ({dt/L*1e6:.1f} us/iter)",
              flush=True)


if __name__ == "__main__":
    if "--deep" in sys.argv:
        deep_bisect()
    else:
        main()


def pool_probe():
    """Feasibility measurement for the POOLED mega-walk (all buckets'
    pairs in one while_loop over a concatenated flat pointer pool):
    per-step cost at pool-scale B and P (run with --pool)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    for B, P, L in ((1024, 64 << 20, 1024), (4096, 256 << 20, 2048)):
        pool = jnp.asarray(rng.integers(0, 255, size=(P,), dtype=np.uint8))
        off0 = jnp.asarray(rng.integers(0, P // 2, size=(B,), dtype=np.int32))
        rowstride = jnp.full((B,), 512, jnp.int32)
        npv = jnp.full((B,), 512, jnp.int32)
        mpv = jnp.full((B,), 512, jnp.int32)

        @jax.jit
        def walk(pool, off0, i0, j0):
            i = i0
            j = j0
            s = jnp.zeros((B,), jnp.int32)
            done = jnp.zeros((B,), bool)
            cnt = jnp.zeros((B,), jnp.int32)
            out = jnp.zeros((L, B), jnp.int32)

            def cond(c):
                return (c[0] < L) & jnp.any(~c[4])

            def body(c):
                step, i, j, s, done, cnt, out = c
                s = jnp.where((j == 0) & (i > 0), 2,
                              jnp.where((i == 0) & (j > 0), 1, s))
                ii = jnp.clip(i - 1, 0, npv - 1)
                jj = jnp.clip(j - 1, 0, mpv - 1)
                ptr = pool[off0 + ii * rowstride + jj].astype(jnp.int32)
                prev = (ptr >> (2 * s)) & 3
                prev = jnp.where((i >= 1) & (j >= 1), prev & 2, 2)
                emit = ~done
                ni = jnp.where(emit & (s != 1), i - 1, i)
                nj = jnp.where(emit & (s != 2), j - 1, j)
                out = jax.lax.dynamic_update_index_in_dim(
                    out, jnp.where(emit, s, 0), step, 0)
                done = done | ((ni == 0) & (nj == 0))
                return step + 1, ni, nj, jnp.where(emit, prev, s), done, \
                    cnt + emit, out

            r = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), i, j, s, done, cnt, out))
            return r[5], r[6]

        i0 = jnp.full((B,), 512, jnp.int32)
        j0 = jnp.full((B,), 512, jnp.int32)
        jax.block_until_ready(walk(pool, off0, i0, j0))
        ts = []
        for rep in range(3):
            o2 = jnp.asarray(
                rng.integers(0, P // 2, size=(B,), dtype=np.int32))
            jax.block_until_ready(o2)
            t0 = time.time()
            cnt, out = walk(pool, o2, i0, j0)
            np.asarray(cnt.reshape(-1)[-1])
            ts.append(time.time() - t0)
        print(f"pool B={B} P={P>>20}MB L={L}: min={min(ts)*1000:.1f} ms "
              f"({min(ts)/1024*1e6:.1f} us/step-of-1024)", flush=True)


if __name__ == "__main__":
    if "--deep" in sys.argv:
        deep_bisect()
    elif "--pool" in sys.argv:
        pool_probe()
    else:
        main()
