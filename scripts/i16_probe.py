#!/usr/bin/env python3
"""Bisect which int16 vector ops Mosaic legalizes on this toolchain.

VERDICT r2 item 2: the i16 x2-density lever is blocked on
`vector<8x128x2xi16> arith.maxsi` failing to legalize.  This probe tests
each candidate op in isolation (and the three prescribed workarounds) so
I16_RETEST_r03.log can say exactly what is and is not available:

  add16       plain i16 add
  max16       jnp.maximum on i16            (the r2 blocker)
  selmax16    jnp.where(a>b,a,b) on i16     (workaround a)
  cmp16       a>b compare only (i1 out)
  sel16       where with precomputed mask
  shift16     pltpu.roll lane shift on i16
  store16     i32 compute, i16 VMEM store + load roundtrip (workaround b)
  pack32      two i16 packed in i32: shift/mask max (workaround c)
  cummax16    associative_scan cummax on i16 (X state)

Run: python scripts/i16_probe.py [names...]   (TPU; each ~40s compile)
"""

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, kernel, out_dtype, n_in=2):
    shape = (8, 128)
    x = jnp.asarray(np.random.default_rng(0).integers(-100, 100, shape),
                    jnp.int16)
    y = jnp.asarray(np.random.default_rng(1).integers(-100, 100, shape),
                    jnp.int16)
    args = (x, y)[:n_in]
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, out_dtype),
        )(*args)
        out.block_until_ready()
        print(f'{{"op": "{name}", "ok": true, "sample": '
              f'{int(np.asarray(out).ravel()[0])}}}', flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = "".join(traceback.format_exception_only(e))[-1500:]
        msg = msg.replace("\\", "/").replace('"', "'").replace("\n", " | ")
        print(f'{{"op": "{name}", "ok": false, "error": "{msg}"}}',
              flush=True)
        return False


def k_add(xr, yr, o):
    o[...] = xr[...] + yr[...]


def k_max(xr, yr, o):
    o[...] = jnp.maximum(xr[...], yr[...])


def k_selmax(xr, yr, o):
    a, b = xr[...], yr[...]
    o[...] = jnp.where(a > b, a, b)


def k_cmp(xr, yr, o):
    o[...] = (xr[...] > yr[...]).astype(jnp.int16)


def k_sel(xr, yr, o):
    a, b = xr[...], yr[...]
    m = a > jnp.int16(0)
    o[...] = jnp.where(m, a, b)


def k_shift(xr, yr, o):
    del yr
    o[...] = pltpu.roll(xr[...], 1, 1)


def k_store16(xr, yr, o, scratch):
    # workaround b: i32 compute, i16 storage
    a = xr[...].astype(jnp.int32)
    b = yr[...].astype(jnp.int32)
    scratch[...] = jnp.maximum(a, b).astype(jnp.int16)
    o[...] = scratch[...]


def k_pack32(xr, yr, o):
    # workaround c: two i16 lanes in one i32, independent max via
    # compare-free arithmetic: unpack (sra/shl), max in i32, repack
    a = xr[...].astype(jnp.int32)
    b = yr[...].astype(jnp.int32)
    packed_a = (a << 16) | (a & 0xFFFF)
    packed_b = (b << 16) | (b & 0xFFFF)
    hi = jnp.maximum(packed_a >> 16, packed_b >> 16)
    lo = jnp.maximum((packed_a << 16) >> 16, (packed_b << 16) >> 16)
    o[...] = ((hi << 16) | (lo & 0xFFFF)).astype(jnp.int16)


def k_cummax(xr, yr, o):
    del yr
    o[...] = jax.lax.associative_scan(jnp.maximum, xr[...], axis=1)


def main():
    tests = {
        "add16": (k_add, jnp.int16, 2, None),
        "max16": (k_max, jnp.int16, 2, None),
        "selmax16": (k_selmax, jnp.int16, 2, None),
        "cmp16": (k_cmp, jnp.int16, 2, None),
        "sel16": (k_sel, jnp.int16, 2, None),
        "shift16": (k_shift, jnp.int16, 2, None),
        "store16": (k_store16, jnp.int16, 2, "scratch"),
        "pack32": (k_pack32, jnp.int16, 2, None),
        "cummax16": (k_cummax, jnp.int16, 2, None),
    }
    want = sys.argv[1:] or list(tests)
    for name in want:
        kernel, dt, n_in, scratch = tests[name]
        if scratch:
            def wrapped(xr, yr, o, s=None, _k=kernel):
                _k(xr, yr, o, s)

            try:
                out = pl.pallas_call(
                    wrapped,
                    out_shape=jax.ShapeDtypeStruct((8, 128), dt),
                    scratch_shapes=[pltpu.VMEM((8, 128), jnp.int16)],
                )(jnp.ones((8, 128), jnp.int16),
                  jnp.full((8, 128), 3, jnp.int16))
                out.block_until_ready()
                print(f'{{"op": "{name}", "ok": true, "sample": '
                      f'{int(np.asarray(out).ravel()[0])}}}', flush=True)
            except Exception as e:  # noqa: BLE001
                msg = "".join(traceback.format_exception_only(e))[-1500:]
                msg = (msg.replace("\\", "/").replace('"', "'")
                       .replace("\n", " | "))
                print(f'{{"op": "{name}", "ok": false, "error": "{msg}"}}',
                      flush=True)
        else:
            _run(name, kernel, dt, n_in)


if __name__ == "__main__":
    main()
