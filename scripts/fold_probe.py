#!/usr/bin/env python3
"""Probe Mosaic legality + speed of in-kernel fold expressions.

Goal: consume S in its natural (K, W) layout inside the folded striped
kernel, building each row's (8, Wf) view in-register — the XLA pre-fold
reshape of the full S costs ~25 ms per 512 MB call (the whole fill is
~4 ms of compute).  Candidates:

  blockstack   folded = stack([S[:, s*Wf:(s+1)*Wf] for s in 8], axis=1)
               one whole-block op per grid step
  rowconcat    per row q (STATIC, unrolled): concat of 8 (1, Wf) lane
               slices at sublane offset q
"""

import sys
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, W = 32, 65536
Wf = W // 8


def k_blockstack(s_ref, o_ref):
    parts = [s_ref[:, s * Wf:(s + 1) * Wf] for s in range(8)]
    o_ref[...] = jnp.stack(parts, axis=1)


def k_rowconcat(s_ref, o_ref):
    for q in range(K):
        row = jnp.concatenate(
            [s_ref[q:q + 1, s * Wf:(s + 1) * Wf] for s in range(8)],
            axis=0,
        )
        o_ref[q] = row


def run(name, kern):
    x = jnp.asarray(
        np.random.default_rng(0).integers(-4, 12, (K, W)).astype(np.float32)
    )
    want = np.asarray(x).reshape(K, 8, Wf)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, 8, Wf), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 << 20),
        )(x)
        ok = bool(np.array_equal(np.asarray(out), want))

        @jax.jit
        def chain(x0, b):
            def body(c, _):
                o = pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((K, 8, Wf), jnp.float32),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=96 << 20),
                )(b, c)
                return c + o[0, 0, :1] * 0.0 + b * 0.0, o[0, 0, 0]
            _, outs = jax.lax.scan(body, x0, None, length=16)
            return outs

        float(np.asarray(chain(x, jnp.float32(0.0)))[-1])
        best = None
        for k in range(3):
            t0 = time.time()
            float(np.asarray(chain(x, jnp.float32(k + 1)))[-1])
            d = (time.time() - t0) / 16
            best = d if best is None else min(best, d)
        print({"probe": name, "ok": ok, "ms_per_block": round(best * 1e3, 3),
               "gbps": round(K * W * 4 / best / 1e9, 1)}, flush=True)
    except Exception as e:  # noqa: BLE001
        msg = "".join(traceback.format_exception_only(e))[:600]
        print({"probe": name, "ok": False, "error": msg}, flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["blockstack", "rowconcat"]
    for nm in which:
        if nm in ("blockstack", "rowconcat"):
            run(nm, {"blockstack": k_blockstack,
                     "rowconcat": k_rowconcat}[nm])


def k_minrows(b_ref, s_ref, o_ref):
    """Minimal DP-like row loop on (8, Wf): 3 rolls + 5 max + 3 adds per
    row — the op floor of a folded fill at this shape."""
    def body(q, st):
        cm, cx, cy = st
        srow = s_ref[q].astype(jnp.float32)
        a = pltpu.roll(cm, shift=1, axis=1)
        b = pltpu.roll(cx, shift=1, axis=1)
        c = pltpu.roll(cy, shift=1, axis=1)
        vm = jnp.maximum(jnp.maximum(a, b), c) + srow
        vy = jnp.maximum(jnp.maximum(cm, cx), cy) + srow
        vx = jnp.maximum(vm, vy) + srow
        return (vm, vx, vy)

    z = jnp.full((8, Wf), b_ref[0, 0], jnp.float32)
    cm, cx, cy = jax.lax.fori_loop(0, K, body, (z, z, z))
    o_ref[...] = cm + cx + cy


def run_minrows():
    x = jnp.asarray(
        np.random.default_rng(0).integers(-4, 12, (K, 8, Wf)).astype(np.int8)
    )

    def call(b, c):
        return pl.pallas_call(
            k_minrows,
            grid=(64,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((K, 8, Wf), lambda k: (k, 0, 0))],
            out_specs=pl.BlockSpec((8, Wf), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, Wf), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 << 20),
        )(b, c)

    big = jnp.asarray(np.tile(np.asarray(x), (64, 1, 1)))

    @jax.jit
    def chain(xb, b):
        o = call(b, xb)
        return o[0, 0]

    float(np.asarray(chain(big, jnp.full((1, 1), 0.0, jnp.float32))))
    best = None
    for k in range(3):
        t0 = time.time()
        float(np.asarray(chain(big, jnp.full((1, 1), float(k), jnp.float32))))
        d = time.time() - t0
        best = d if best is None else min(best, d)
    cells = 64 * K * 8 * Wf
    print({"probe": "minrows", "ms": round(best * 1e3, 2),
           "gcups": round(cells / best / 1e9, 2)}, flush=True)


if __name__ == "__main__" and "minrows" in sys.argv:
    run_minrows()


def run_minrows2(tag, P, Wl, nosrc=False, nblocks=64, rows=32):
    """Same minimal row loop at arbitrary slab shape (P, Wl)."""
    def kern(b_ref, s_ref, o_ref):
        def body(q, st):
            cm, cx, cy = st
            if nosrc:
                srow = cm + b_ref[0, 0]
            else:
                srow = s_ref[0, q].astype(jnp.float32)
            a = pltpu.roll(cm, shift=1, axis=1)
            b = pltpu.roll(cx, shift=1, axis=1)
            c = pltpu.roll(cy, shift=1, axis=1)
            vm = jnp.maximum(jnp.maximum(a, b), c) + srow
            vy = jnp.maximum(jnp.maximum(cm, cx), cy) + srow
            vx = jnp.maximum(vm, vy) + srow
            return (vm, vx, vy)

        z = jnp.full((P, Wl), b_ref[0, 0], jnp.float32)
        cm, cx, cy = jax.lax.fori_loop(0, rows, body, (z, z, z))
        o_ref[...] = cm + cx + cy

    x = jnp.asarray(np.random.default_rng(0).integers(
        -4, 12, (nblocks, rows, P, Wl)).astype(np.int8))

    def call(b, c):
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, 1), lambda k: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, rows, P, Wl), lambda k: (k, 0, 0, 0))],
            out_specs=pl.BlockSpec((P, Wl), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((P, Wl), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=96 << 20),
        )(b, c)

    @jax.jit
    def chain(xb, b):
        o = call(b, xb)
        return o[0, 0]

    float(np.asarray(chain(x, jnp.full((1, 1), 0.0, jnp.float32))))
    best = None
    for k in range(3):
        t0 = time.time()
        float(np.asarray(chain(x, jnp.full((1, 1), float(k), jnp.float32))))
        d = time.time() - t0
        best = d if best is None else min(best, d)
    cells = nblocks * rows * P * Wl
    print({"probe": tag, "ms": round(best * 1e3, 2),
           "gcups": round(cells / best / 1e9, 2)}, flush=True)


if __name__ == "__main__" and "minrows2" in sys.argv:
    run_minrows2("prod-shape (128,512)", 128, 512)
    run_minrows2("mid-shape (32,2048)", 32, 2048)
    run_minrows2("fold-shape fewer-blocks", 8, 8192, nblocks=8)
