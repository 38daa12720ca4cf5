#!/usr/bin/env python3
"""Print effective HBM read+write GB/s of an XLA elementwise chain.

Health probe for the axon TPU tunnel: v5e streams ~800 GB/s when healthy;
the 2026-08-18 degradation window measured ~9 GB/s (MEASUREMENTS_r02.md).
Exit code 0 when bandwidth exceeds the threshold (argv[1], default 200).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    thresh = float(sys.argv[1]) if len(sys.argv) > 1 else 200.0
    assert jax.default_backend() == "tpu", jax.default_backend()
    x = jnp.ones((16 * 1024 * 1024,), jnp.float32)  # 64 MB

    @jax.jit
    def ew(x0):
        def body(c, _):
            c = jnp.maximum(c * 1.0000001 + 0.5, c)
            return c, c[0]
        _, out = jax.lax.scan(body, x0, None, length=64)
        return out

    float(np.asarray(ew(x))[-1])  # warm
    t0 = time.time()
    float(np.asarray(ew(x + 1.0))[-1])
    dt = (time.time() - t0) / 64
    gbs = 64 / 1024 * 2 / dt  # read+write per iter
    print(f"hbm_gbs={gbs:.1f}", flush=True)
    sys.exit(0 if gbs > thresh else 1)


if __name__ == "__main__":
    main()
