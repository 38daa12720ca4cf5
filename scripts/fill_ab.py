#!/usr/bin/env python3
"""A/B the pooled fill program (SWTPU_POOLED_FILL) in ONE process.

Window drift at 3200 pairs is ±30% (MEASUREMENTS_r04.md §8), so the only
trustworthy comparison is alternating reps inside one process/window.
Pooled and per-chunk paths compile DIFFERENT programs (fill_many vs
fill_from_codes), so both stay warm in one process's jit caches; the env
var is read per BatchAligner construction.

Usage: python -u scripts/fill_ab.py [--rep 3] [--scale 32] [--mode local]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REF = "/root/reference"


def load_pairs():
    from smithwaterman_tpu.io.fasta import load_fasta

    pairs = []
    with open(f"{REF}/test/file_list.txt") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                a = load_fasta(f"{REF}/test/{parts[0]}")[0]
                b = load_fasta(f"{REF}/test/{parts[1]}")[0]
                pairs.append((a, b))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=3)
    ap.add_argument("--scale", type=int, default=32)
    ap.add_argument("--mode", default="local")
    ap.add_argument("--score_only", action="store_true")
    ap.add_argument("--ladder", default="new", choices=("new", "old"),
                    help="old = r4 pow2 ladder (use for the pooled-vs-"
                         "per-chunk A/B: per-chunk pays one cold compile "
                         "PER BUCKET, ~61 of them on the new ladder)")
    ap.add_argument("--arms", default="1,0",
                    help="comma list of SWTPU_POOLED_FILL arms to run")
    args = ap.parse_args()

    import jax

    from smithwaterman_tpu import GLOBAL, GLOCAL, LOCAL
    from smithwaterman_tpu.batch_aligner import BatchAligner
    from smithwaterman_tpu.config import AlignConfig

    consts = {"local": LOCAL, "global": GLOBAL, "glocal": GLOCAL}
    OLD = (64, 128, 256, 512, 1024, 2048, 4096, 8192)
    pairs = load_pairs()
    rng = np.random.default_rng(0)
    big = [pairs[i % len(pairs)] for i in range(args.scale * len(pairs))]
    big = [big[i] for i in rng.permutation(len(big))]
    cells = sum(len(a.seq) * len(b.seq) for a, b in big)
    print(json.dumps({"backend": jax.default_backend(),
                      "pairs": len(big), "gcells": round(cells / 1e9, 3)}),
          flush=True)

    arms = tuple(a.strip() for a in args.arms.split(",") if a.strip())
    cfg = AlignConfig(mode=consts[args.mode])
    if args.ladder == "old":
        cfg = AlignConfig(mode=consts[args.mode], buckets=OLD)
    engines = {}
    for pooled in arms:
        os.environ["SWTPU_POOLED_FILL"] = pooled
        engines[pooled] = BatchAligner(config=cfg)

    def run(pooled):
        ba = engines[pooled]
        t0 = time.time()
        if args.score_only:
            ba.score_pairs(big)
        else:
            ba.align_pairs(big)
        return time.time() - t0

    # compile both paths
    for pooled in arms:
        dt = run(pooled)
        print(json.dumps({"pooled": pooled, "cold_s": round(dt, 3)}),
              flush=True)
    walls = {a: [] for a in arms}
    for r in range(args.rep):
        for pooled in arms:
            dt = run(pooled)
            walls[pooled].append(round(dt, 3))
            print(json.dumps({"rep": r, "pooled": pooled,
                              "wall_s": round(dt, 3),
                              "phase": {k: round(v, 3) for k, v in
                                        engines[pooled].phase.items()}}),
                  flush=True)
    for pooled in arms:
        best = min(walls[pooled])
        print(json.dumps({
            "metric": f"fill_ab_pooled{pooled}", "walls": walls[pooled],
            "best_s": best, "gcups_best": round(cells / best / 1e9, 3),
            "ladder": args.ladder,
        }), flush=True)


if __name__ == "__main__":
    main()
