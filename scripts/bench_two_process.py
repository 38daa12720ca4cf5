#!/usr/bin/env python3
"""Two-process throughput: the first REAL multi-process scaling signal.

BASELINE.md targets >85% efficiency at 2 hosts; this environment has one
TPU chip, so the only distributed throughput signal it can produce is a
host-sharded sweep over a real 2-process localhost ``jax.distributed``
rendezvous on the CPU backend (VERDICT r3 task 5).  Each process owns the
sweep chunks with ``chunk % nprocs == pid`` (sweep.py), exactly the
multi-host production flow; wall time is the slowest worker, end to end
(rendezvous + compile excluded via a warmup pass inside each worker).

Prints one JSON line per configuration and writes a ``two_process``
section for SCALING_r04.json via --out.

Usage: python -u scripts/bench_two_process.py [--pairs 768] [--len 192]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_SRC = r'''
import os, sys, time
PORT, PID, NPROC, OUT_DIR, NPAIRS, SLEN = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    int(sys.argv[5]), int(sys.argv[6]),
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, REPO)
import numpy as np
from smithwaterman_tpu import BatchAligner, LOCAL, SeqData
from smithwaterman_tpu.parallel import multihost
from smithwaterman_tpu.sweep import SweepConfig, sweep

if NPROC > 1:
    multihost.initialize(f"localhost:{PORT}", num_processes=NPROC,
                         process_id=PID)
    assert multihost.process_count() == NPROC

LETTERS = "ARNDCQEGHILKMFPSTWYV"
rng = np.random.default_rng(7)
# one sequence set; the sweep's upper triangle supplies the pairs
nseq = 1
while nseq * (nseq - 1) // 2 < NPAIRS:
    nseq += 1
seqs = [
    SeqData(f"s{i}", "", "".join(rng.choice(list(LETTERS), SLEN)))
    for i in range(nseq)
]
engine = BatchAligner(mode=LOCAL)
# warmup: compile the bucket programs outside the timed region
engine.align_pairs([(seqs[0], seqs[1])] * 16, retain_all=True)

cfg = SweepConfig(chunk_pairs=64, score_only=False, retain_all=True,
                  process_index=PID, process_count=NPROC)
out = os.path.join(OUT_DIR, f"shard{PID}.jsonl")
t0 = time.time()
n = sweep(seqs, None, engine, out, cfg)
dt = time.time() - t0
print(f"WORKER {PID} OK chunks={n} seconds={dt:.3f}", flush=True)
'''


def run_config(nproc: int, npairs: int, slen: int):
    port = 0
    if nproc > 1:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    with tempfile.TemporaryDirectory() as td:
        wpath = os.path.join(td, "worker.py")
        with open(wpath, "w") as f:
            f.write(f"REPO = {REPO!r}\n" + WORKER_SRC)
        t0 = time.time()
        procs = [
            subprocess.Popen(
                [sys.executable, "-u", wpath, str(port), str(pid),
                 str(nproc), td, str(npairs), str(slen)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env,
            )
            for pid in range(nproc)
        ]
        outs = [p.communicate(timeout=1800)[0] for p in procs]
        wall = time.time() - t0
        secs = []
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {pid}:\n{out}"
            line = [ln for ln in out.splitlines() if "OK chunks=" in ln][0]
            secs.append(float(line.split("seconds=")[1]))
        return wall, max(secs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=768)
    ap.add_argument("--len", dest="slen", type=int, default=192)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    nseq = 1
    while nseq * (nseq - 1) // 2 < args.pairs:
        nseq += 1
    npairs = nseq * (nseq - 1) // 2
    rows = []
    for nproc in (1, 2):
        wall, sweep_s = run_config(nproc, args.pairs, args.slen)
        row = {
            "metric": "two_process_sweep", "processes": nproc,
            "pairs": npairs, "seq_len": args.slen,
            "sweep_seconds": round(sweep_s, 3),
            "pairs_per_second": round(npairs / sweep_s, 2),
            "wall_seconds_incl_startup": round(wall, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    eff = rows[0]["sweep_seconds"] / (2 * rows[1]["sweep_seconds"])
    summary = {
        "metric": "two_process_efficiency",
        "value": round(eff, 3),
        "basis": "t(1 proc) / (2 * t(2 proc)), sweep region only "
                 "(rendezvous + compile excluded)",
        "backend": "cpu (localhost jax.distributed; the 1-chip "
                   "environment cannot race two real TPU hosts)",
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
