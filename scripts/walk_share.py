#!/usr/bin/env python3
"""Walk-share measurement: align_pairs vs score_pairs on the SAME 32x
suite, alternating in one process/window.  score_pairs skips the tb
write, the pooled walks, the move-stream D2H and the reconstruct, so the
per-rep delta bounds the whole traceback side's cost (VERDICT r4 task 3:
fix or exonerate the score-only inversion).

Usage: python -u scripts/walk_share.py [--rep 3] [--scale 32]
"""

import argparse
import json
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    from smithwaterman_tpu import GLOBAL, GLOCAL, LOCAL
    from smithwaterman_tpu.batch_aligner import BatchAligner
    from smithwaterman_tpu.utils.metrics import hbm_stream_probe

    consts = {"local": LOCAL, "global": GLOBAL, "glocal": GLOCAL}
    pairs = load_pairs()
    rng = np.random.default_rng(0)
    big = [pairs[i % len(pairs)] for i in range(args.scale * len(pairs))]
    big = [big[i] for i in rng.permutation(len(big))]
    cells = sum(len(a.seq) * len(b.seq) for a, b in big)
    rows = [{"backend": jax.default_backend(), "pairs": len(big),
             "gcells": round(cells / 1e9, 3),
             "hbm_stream_gbs": hbm_stream_probe()}]
    print(json.dumps(rows[0]), flush=True)

    ba = BatchAligner(mode=consts[args.mode])
    # compile both paths
    ba.align_pairs(big)
    ba.score_pairs(big)
    al, so = [], []
    for r in range(args.rep):
        t0 = time.time()
        ba.align_pairs(big)
        al.append(round(time.time() - t0, 3))
        pa = {k: round(v, 3) for k, v in ba.phase.items()}
        t0 = time.time()
        ba.score_pairs(big)
        so.append(round(time.time() - t0, 3))
        ps = {k: round(v, 3) for k, v in ba.phase.items()}
        row = {"rep": r, "align_s": al[-1], "score_s": so[-1],
               "align_phase": pa, "score_phase": ps,
               "walk_side_delta_s": round(al[-1] - so[-1], 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    summary = {
        "metric": "walk_share_32x", "align_best_s": min(al),
        "score_best_s": min(so),
        "align_gcups_best": round(cells / min(al) / 1e9, 3),
        "score_gcups_best": round(cells / min(so) / 1e9, 3),
        "inversion": bool(min(so) > min(al)),
        "window": {"hbm_stream_gbs_end": hbm_stream_probe(),
                   "reps": args.rep},
    }
    rows.append(summary)
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
