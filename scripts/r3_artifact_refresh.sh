#!/bin/sh
# Serial end-of-round artifact refresh (ONE process at a time on the TPU
# tunnel — a second process hangs at compile).  Each step is independent;
# rerun any that fail.  CPU steps can run while no TPU step is active.
set -x

# TPU artifacts
timeout 5400 python -u scripts/bench_vs_reference.py --out REFBENCH_r03.json
timeout 5400 python -u scripts/bench_suite.py --out BENCH_SUITE_r03.json
timeout 3000 python -u scripts/run_harness.py | grep -v WARN > HARNESS_r03.txt
timeout 3600 python -u scripts/tpu_checks.py | grep -v WARN > TPU_CHECKS_r03.txt
timeout 2400 python -u scripts/giant_pair_check.py | grep -v WARN > GIANT_PAIR_r03.txt
timeout 900 python -u bench.py

# CPU artifacts
JAX_PLATFORMS=cpu timeout 1200 python -u scripts/run_golden.py
timeout 1800 python -u scripts/bench_scaling.py --host-devices 8 \
  --devices 1,2,4,8 --pairs 128 --len 256 --score-only  # -> SCALING_r03.json rows
