#!/usr/bin/env python3
"""Ablate the D=1 folded grid kernel's per-row cost structure on TPU.

striped 2048x65536 measures ~31 ms (~4.2 GCUPS) while the production row
kernel does the same vreg volume at 35-44 GCUPS.  Candidates: the global
cummax (_roll_cummax: 13 rotate+mask+max sweeps over 64 vregs per row),
the cross-sublane shift carries, or the row math itself.  Each variant
keeps the loop-carried dependency so nothing is DCE'd.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from smithwaterman_tpu.parallel import seq_tiled
from smithwaterman_tpu.config import LOCAL

NS, MS = 2048, 65536
Wf = MS // 8
K = 32


def run(tag):
    rng = np.random.default_rng(0)
    S_f = jnp.asarray(
        rng.integers(-4, 12, size=(NS, 8, Wf)).astype(np.int8)
    )
    S_f.block_until_ready()
    nv = jnp.full((1, 1), NS, jnp.int32)
    mv = jnp.full((1, 1), MS, jnp.int32)

    @jax.jit
    def go(S_f, nv, mv):
        rb, rbi, acc = seq_tiled._fold_grid_fill(
            S_f, nv, mv, mode=LOCAL, og=-10.0, eg=-0.5, so=0.0, se=0.0,
            sent=10.0 * -10.0 + 10.0 * -0.5, K=K, Wf=Wf, NP=NS,
        )
        return jnp.max(rb)

    float(np.asarray(go(S_f, nv, mv)))
    best = None
    for k in range(3):
        nvk = jnp.asarray(np.full((1, 1), NS, np.int32))
        t0 = time.time()
        float(np.asarray(go(S_f, nvk, mv)))
        d = time.time() - t0
        best = d if best is None else min(best, d)
    print({"variant": tag, "ms": round(best * 1e3, 1),
           "gcups": round(NS * MS / best / 1e9, 2)}, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "full"
    if which == "nocummax":
        seq_tiled._fold_cummax = lambda v: v + v  # keep dep, drop scan
    elif which == "noshift":
        orig = seq_tiled._fold_shift_right
        from jax.experimental.pallas import tpu as pltpu
        seq_tiled._fold_shift_right = (
            lambda v, fill: pltpu.roll(v, shift=1, axis=1))
    elif which == "noboth":
        from jax.experimental.pallas import tpu as pltpu
        seq_tiled._fold_cummax = lambda v: v + v
        seq_tiled._fold_shift_right = (
            lambda v, fill: pltpu.roll(v, shift=1, axis=1))
    run(which)


if __name__ == "__main__":
    main()


def run_chained(tag, ncall=8):
    """Chain ncall grid fills inside one jit: subtracts the ~25 ms fixed
    tunnel round-trip that poisons single-call timings."""
    rng = np.random.default_rng(0)
    S_f = jnp.asarray(
        rng.integers(-4, 12, size=(NS, 8, Wf)).astype(np.int8)
    )
    S_f.block_until_ready()
    mv = jnp.full((1, 1), MS, jnp.int32)

    @jax.jit
    def chain(S_f, nv0, mv):
        def body(nv, _):
            rb, rbi, acc = seq_tiled._fold_grid_fill(
                S_f, nv, mv, mode=LOCAL, og=-10.0, eg=-0.5, so=0.0,
                se=0.0, sent=10.0 * -10.0 + 10.0 * -0.5, K=K, Wf=Wf,
                NP=NS,
            )
            out = jnp.max(rb)
            return nv + (out * 0.0).astype(jnp.int32), out
        _, outs = jax.lax.scan(body, nv0, None, length=ncall)
        return outs

    nv = jnp.full((1, 1), NS, jnp.int32)
    float(np.asarray(chain(S_f, nv, mv))[-1])
    best = None
    for k in range(3):
        nvk = jnp.asarray(np.full((1, 1), NS, np.int32))
        t0 = time.time()
        float(np.asarray(chain(S_f, nvk, mv))[-1])
        d = (time.time() - t0) / ncall
        best = d if best is None else min(best, d)
    print({"variant": tag, "ms_per_fill": round(best * 1e3, 1),
           "gcups": round(NS * MS / best / 1e9, 2)}, flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "chained":
    run_chained("chained")
