#!/bin/bash
# Wait for the TPU worker to recover from the 2026-08-18 HBM-bandwidth
# degradation (scripts/probe_hbm.py), then regenerate every stale round-2
# artifact serially in ONE shell (the tunnel admits one process at a time).
# Usage: setsid nohup bash scripts/r2_wait_and_measure.sh > WAIT_r02.log 2>&1 &
set -x
cd /root/repo

# 0. wait for tunnel + healthy bandwidth (probe every 10 min, up to ~10 h)
for i in $(seq 1 60); do
  if curl -s -m 5 -o /dev/null http://127.0.0.1:8093/remote_compile; then
    if timeout 600 python -u scripts/probe_hbm.py 300; then
      break
    fi
  fi
  sleep 600
done

# 1. wavefront (diag) vs row decision measurement
timeout 1800 python -u scripts/measure_diag.py 2>&1 | tee MEASURE_DIAG_r02.log

# 2. refreshed fill + longseq + banded numbers (post-xscan kernel)
timeout 3600 python -u scripts/measure_xscan.py 2>&1 | tee MEASURE_r02.log

# 3. the reference's own checker, accelerated slots on the Pallas kernel
timeout 3600 python -u scripts/run_harness.py --workdir /tmp/swt_harness_tpu \
  2>&1 | tee HARNESS_r02.txt

# 4. per-bucket/mode suite
timeout 7200 python -u scripts/bench_suite.py --out BENCH_SUITE_r02.json \
  2>&1 | tee /tmp/r2_suite.log

# 5. hardware checks incl. the striped rows
timeout 3600 python -u scripts/tpu_checks.py 2>&1 | tee TPU_CHECKS_r02.txt

# 6. headline sanity
timeout 1200 python -u bench.py 2>&1 | tee BENCH_HEADLINE_r02.log

# 7. i16 x2-domain retest (kernel lab; known-blocked on Mosaic i16 maxsi)
timeout 1800 python -u scripts/kernel_lab.py i16 i16-fuse-R8 \
  2>&1 | tee I16_RETEST_r02.log

echo DONE-ALL
