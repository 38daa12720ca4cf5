#!/usr/bin/env python3
"""A/B the non-LOCAL 512^2 traceback rows under kernel env knobs.

r3's tile ladder moved the 512-pair 512^2 bucket from tile=128 to
tile=512, which shrinks the row block to rb=8 (= one register group) and
therefore turns the finals_gate OFF for traceback fills
(ops/pallas_dp._use_finals_gate).  r2's suite measured ~34 GCUPS for
non-LOCAL 512^2 tb at tile=128 (multi-group, gated); r3's suite reads
29-32 at tile=512.  This script measures the production fill under one
env configuration per PROCESS (the knobs are frozen at import —
CLAUDE.md separate-process rule):

    python -u scripts/ab_nonlocal512.py                     # control
    SWTPU_FINALS_GATE=force python -u scripts/ab_nonlocal512.py
    SWTPU_RB_BUDGET_KB=4096 python -u scripts/ab_nonlocal512.py
    SWTPU_TILE_CAP=128 python -u scripts/ab_nonlocal512.py  # r2 tiling

Prints one JSON line per row; local tb is included as the within-process
anchor (cross-process windows drift +/-15%).
"""

import json
import os
import sys

sys.path.insert(0, ".")


def main():
    cap = int(os.environ.get("SWTPU_TILE_CAP", "0"))
    if cap:
        from smithwaterman_tpu.ops import pallas_dp

        orig = pallas_dp.choose_tile

        def capped(count, mp_pad):
            return min(orig(count, mp_pad), cap)

        pallas_dp.choose_tile = capped
        # bench_suite imports choose_tile by name — patch before import
    from scripts.bench_suite import bench_fill

    from smithwaterman_tpu.config import GLOBAL, GLOCAL, LOCAL

    env = {
        k: os.environ.get(k)
        for k in ("SWTPU_FINALS_GATE", "SWTPU_RB_BUDGET_KB",
                  "SWTPU_MAX_ROWGROUP", "SWTPU_TILE_CAP")
        if os.environ.get(k)
    }
    for mode, name in ((GLOBAL, "global"), (GLOCAL, "glocal"),
                       (LOCAL, "local")):
        gcups, dt = bench_fill(512, 512, mode, score_only=False)
        print(json.dumps({"env": env, "mode": name, "B": 512, "N": 512,
                          "tb_gcups": round(gcups, 2),
                          "ms_per_call": round(dt * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
