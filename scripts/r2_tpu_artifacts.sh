#!/bin/bash
# Round-2 TPU artifact queue: run serially in ONE shell (the tunnel admits
# one process at a time).  Usage: bash scripts/r2_tpu_artifacts.sh
set -x
cd /root/repo

# 0. wait for the tunnel
until curl -s -m 5 http://127.0.0.1:8093/remote_compile -o /dev/null; do
  sleep 60
done

# 1. fill + longseq + banded numbers with the fixed honest timing
timeout 3600 python -u scripts/measure_xscan.py 2>&1 | tee MEASURE_r02.log

# 2. row-group A/B, one process per R (in-process A/B is invalid)
for R in 8 16; do
  SWTPU_MAX_ROWGROUP=$R timeout 1800 python -u scripts/measure_banded_r.py \
    2>&1 | tee -a RAB_r02.log
done

# 3. the reference's own checker, accelerated slots on the Pallas kernel
# (own workdir: a concurrent CPU harness run uses the default one)
timeout 3600 python -u scripts/run_harness.py --workdir /tmp/swt_harness_tpu \
  2>&1 | tee HARNESS_r02.txt

# 4. per-bucket/mode suite (now incl. GLOBAL rows)
timeout 7200 python -u scripts/bench_suite.py --out BENCH_SUITE_r02.json \
  2>&1 | tee /tmp/r2_suite.log

# 5. hardware checks incl. the new striped rows
timeout 3600 python -u scripts/tpu_checks.py 2>&1 | tee TPU_CHECKS_r02.txt

# 6. headline sanity
timeout 1200 python -u bench.py 2>&1 | tee BENCH_HEADLINE_r02.log
echo DONE-ALL
