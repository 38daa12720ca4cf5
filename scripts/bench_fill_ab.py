#!/usr/bin/env python3
"""Focused fill A/B: LOCAL tb+so at 256^2 and 512^2 (the VERDICT r2 #3/#5
targets).  Run in SEPARATE processes per env setting:

  python scripts/bench_fill_ab.py                         # defaults
  SWTPU_MAX_ROWGROUP=16 python scripts/bench_fill_ab.py
  SWTPU_RB_BUDGET_KB=2048 python scripts/bench_fill_ab.py
"""

import json
import os
import sys

sys.path.insert(0, ".")

import jax


def main():
    assert jax.default_backend() == "tpu"
    from bench_suite import bench_fill  # noqa: E402

    from smithwaterman_tpu.config import GLOCAL, LOCAL

    env = {k: os.environ.get(k) for k in
           ("SWTPU_MAX_ROWGROUP", "SWTPU_RB_BUDGET_KB", "SWTPU_FINALS_GATE")
           if os.environ.get(k)}

    cfgs = [(2048, 256, LOCAL, "local"), (512, 512, LOCAL, "local")]
    if "--big" in sys.argv:
        cfgs += [(128, 1024, LOCAL, "local")]
    if "--x4096" in sys.argv:
        # the 4096^2 "dip" hypothesis: 8 pairs -> tile 8 -> (8, 4096)
        # slabs are issue-dominated; 32 pairs -> tile 32 should close it
        cfgs = [(8, 4096, LOCAL, "local"), (32, 4096, LOCAL, "local")]
    if "--glocal256" in sys.argv:
        cfgs = [(2048, 256, GLOCAL, "glocal"), (512, 512, GLOCAL, "glocal")]
    for B, N, mode, mname in cfgs:
        for so in (False, True):
            g, dt = bench_fill(B, N, mode, so)
            print(json.dumps({
                "bucket": f"{N}x{N}", "pairs": B, "mode": mname,
                "score_only": so,
                "gcups": round(g, 2), "ms_per_call": round(dt * 1e3, 2),
                "env": env}), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
