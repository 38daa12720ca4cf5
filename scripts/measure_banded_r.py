#!/usr/bin/env python3
"""TPU: single-R fill measurement for row-group A/B runs.

Run ONCE PER R VALUE in separate processes:

    for R in 8 16 32; do SWTPU_MAX_ROWGROUP=$R python -u scripts/measure_banded_r.py; done

An in-process loop mutating ``pallas_dp._MAX_R`` is INVALID: jit caches of
callers keep the previously traced kernel, so later "R" rows silently
re-time the first one (caught by review; the env var exists for exactly
this).  Cross-process tunnel variance is ~±15% — repeat runs to decide
close calls.
"""

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax

assert jax.default_backend() == "tpu", jax.default_backend()

from measure_xscan import bench_fill  # noqa: E402  (shared honest-timing harness)
from smithwaterman_tpu.config import LOCAL  # noqa: E402

R = os.environ.get("SWTPU_MAX_ROWGROUP", "8")
for so in (False, True):
    g, dt = bench_fill(512, 512, LOCAL, so)
    print(f"R={R} local so={so}: {g:.1f} GCUPS ({dt*1e3:.2f} ms/call)",
          flush=True)
