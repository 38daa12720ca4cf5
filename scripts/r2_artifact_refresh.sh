#!/bin/bash
# Round-2 late artifact refresh: regenerate every artifact that predates the
# xscan/finals_gate kernel, serially in ONE shell (the tunnel admits one
# process at a time).  All scripts use resident-S chains (valid protocol).
# Usage: bash scripts/r2_artifact_refresh.sh
set -x
cd /root/repo

# 0. wait for the tunnel
until curl -s -m 5 http://127.0.0.1:8093/remote_compile -o /dev/null; do
  sleep 60
done

# 1. the reference's own checker, accelerated slots on the Pallas kernel
timeout 3600 python -u scripts/run_harness.py --workdir /tmp/swt_harness_tpu \
  2>&1 | tee HARNESS_r02.txt

# 2. per-bucket/mode suite (incl. GLOBAL rows)
timeout 10800 python -u scripts/bench_suite.py --out BENCH_SUITE_r02.json \
  2>&1 | tee /tmp/r2_suite.log

# 3. hardware checks incl. the striped rows
timeout 3600 python -u scripts/tpu_checks.py 2>&1 | tee TPU_CHECKS_r02.txt

# 4. headline sanity
timeout 1200 python -u bench.py 2>&1 | tee BENCH_HEADLINE_r02.log

echo DONE-ALL
