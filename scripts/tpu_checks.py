#!/usr/bin/env python3
"""On-hardware (TPU) end-to-end checks against the EMBOSS goldens.

The pytest suite forces CPU (tests/conftest.py), so Mosaic legality and
real-hardware numerics of the production kernels are verified here: run on
a TPU-attached host, prints one PASS/FAIL line per check, exit 0 iff all
pass.  Kept fast (~10 min cold; compiles dominate) by putting every pair
in the same (512, 512) bucket.

Covers: the Pallas fill (3 modes x {traceback, score-only} — including the
non-LOCAL final-row capture path), the opt-in wavefront score route, the
batched banded kernel with its on-device pointer walker, and the longseq
checkpoint+refill path with batched window gathers.

Usage:  python -u scripts/tpu_checks.py  (writes TPU_CHECKS.txt via tee-able
stdout; the driver artifact is committed by the round script)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

FAIL = 0


def report(name, ok, extra=""):
    global FAIL
    print(f"{'PASS' if ok else 'FAIL'} {name} {extra}".rstrip(), flush=True)
    if not ok:
        FAIL = 1


def main():
    backend = jax.default_backend()
    print(f"backend={backend} devices={len(jax.devices())}", flush=True)
    if backend != "tpu":
        print("FAIL not-on-tpu", flush=True)
        sys.exit(1)

    from smithwaterman_tpu import (
        Aligner, BatchAligner, GLOBAL, GLOCAL, LOCAL, load_fasta,
    )
    from smithwaterman_tpu.aligner import reconstruct_alignment
    from smithwaterman_tpu.matrices import SubstitutionMatrix
    from smithwaterman_tpu.ops import banded
    from smithwaterman_tpu.utils import oracle

    # all four pairs land in the (512, 512) bucket -> one compile per
    # (mode, score_only) program
    TAGS = [4, 13, 15, 28]
    pairs, goldens = [], {}
    for t in TAGS:
        s1 = load_fasta(f"/root/reference/test/inputs/seq{t}.1.fas")[0]
        s2 = load_fasta(f"/root/reference/test/inputs/seq{t}.2.fas")[0]
        pairs.append((s1, s2))
        goldens[t] = {
            "local": oracle.parse_emboss_dat(
                f"/root/reference/test/emboss_results/res{t}.dat"),
            "global": oracle.parse_emboss_dat(
                f"/root/reference/test/emboss_results/needle_res{t}.dat"),
            "glocal": oracle.parse_emboss_dat(
                f"/root/reference/test/emboss_results/needle_glocal_res{t}.dat"),
        }

    MODES = [("local", LOCAL), ("glocal", GLOCAL), ("global", GLOBAL)]

    # 1. production Pallas kernel: full traceback vs goldens -------------
    for name, mode in MODES:
        t0 = time.time()
        res = BatchAligner(mode=mode, backend="pallas").align_pairs(pairs)
        for t, r in zip(TAGS, res):
            g = goldens[t][name]
            a1, a2 = r.aligned1, r.aligned2
            if name == "local":
                a1, a2 = oracle.trim_terminal(a1, a2)
            report(
                f"pallas-tb-{name}-seq{t}",
                r.score == g.score and (a1, a2) == (g.seq1, g.seq2),
                f"({time.time() - t0:.1f}s)",
            )
            t0 = time.time()

    # 2. score-only path (non-LOCAL exercises the final-row capture) ----
    for name, mode in MODES:
        t0 = time.time()
        sc = BatchAligner(mode=mode, backend="pallas").score_pairs(pairs)
        ok = all(
            abs(float(s) - goldens[t][name].score) < 1e-4
            for t, s in zip(TAGS, sc)
        )
        report(f"pallas-scoreonly-{name}", ok,
               f"({time.time() - t0:.1f}s)")

    # 2b. wavefront (diag) score route: Mosaic legality + exactness of the
    #     opt-in scan-free kernel against the same goldens ---------------
    t0 = time.time()
    sc = BatchAligner(
        mode=LOCAL, backend="pallas", diag_scores=True
    ).score_pairs(pairs)
    ok = all(
        abs(float(s) - goldens[t]["local"].score) < 1e-4
        for t, s in zip(TAGS, sc)
    )
    report("diag-scoreonly-local", ok, f"({time.time() - t0:.1f}s)")

    # 3. batched banded kernel + on-device walker: band covers the whole
    #    matrix -> must equal the exact alignment -----------------------
    sm = SubstitutionMatrix.blosum62()
    code_pairs = [
        (sm.seq_to_index(s1.seq), sm.seq_to_index(s2.seq))
        for s1, s2 in pairs
    ]
    for name, mode in [("local", LOCAL), ("global", GLOBAL)]:
        t0 = time.time()
        out = banded.align_banded_batch(
            code_pairs, sm.table, mode=mode, og=-10.0, eg=-0.5, band=512,
        )
        for t, (s1, s2), (idx1, idx2, score, _) in zip(TAGS, pairs, out):
            g = goldens[t][name]
            r = reconstruct_alignment(
                s1.seq, s2.seq, idx1, idx2, score, True, mode)
            a1, a2 = r.aligned1, r.aligned2
            if name == "local":
                a1, a2 = oracle.trim_terminal(a1, a2)
            report(
                f"banded-devwalk-{name}-seq{t}",
                score == g.score and (a1, a2) == (g.seq1, g.seq2),
                f"({time.time() - t0:.1f}s)",
            )
            t0 = time.time()

    # 4. longseq path (checkpointed fill + batched window re-fill) ------
    t0 = time.time()
    ba = BatchAligner(mode=LOCAL, backend="pallas",
                      longseq_cells=512 * 512)
    res = ba.align_pairs(pairs)
    for t, r in zip(TAGS, res):
        g = goldens[t]["local"]
        a1, a2 = oracle.trim_terminal(r.aligned1, r.aligned2)
        report(
            f"longseq-local-seq{t}",
            r.score == g.score and (a1, a2) == (g.seq1, g.seq2),
            f"({time.time() - t0:.1f}s)",
        )
        t0 = time.time()

    # 5. striped (sequence-tiled) alignment with Pallas per-shard rows:
    # Mosaic legality + string exactness of the mesh path on hardware
    # (the pytest mesh tests run on virtual CPU devices only)
    from smithwaterman_tpu.parallel import make_mesh
    from smithwaterman_tpu.parallel.seq_tiled import striped_align

    t0 = time.time()
    sm = SubstitutionMatrix.blosum62()
    mesh = make_mesh(1)
    t = TAGS[0]
    s1, s2 = pairs[0]
    codes1 = sm.seq_to_index(s1.seq)
    codes2 = sm.seq_to_index(s2.seq)
    npp = -(-len(codes1) // 8) * 8
    mpp = -(-len(codes2) // 128) * 128
    Sd = np.full((1, npp, mpp), -1e4, np.float32)
    Sd[0, : len(codes1), : len(codes2)] = sm.dense_scores(codes1, codes2)
    for rows in ("jax", "pallas"):
        idx_lists, stats = striped_align(
            Sd, np.array([len(codes1)], np.int32),
            np.array([len(codes2)], np.int32),
            mode=LOCAL, og=-10.0, eg=-0.5, mesh=mesh, rows=rows,
        )
        g = goldens[t]["local"]
        got = reconstruct_alignment(
            s1.seq, s2.seq, idx_lists[0][0], idx_lists[0][1],
            float(stats[0, 0]), True, LOCAL,
        )
        a1, a2 = oracle.trim_terminal(got.aligned1, got.aligned2)
        report(
            f"striped-local-rows_{rows}-seq{t}",
            float(stats[0, 0]) == g.score and (a1, a2) == (g.seq1, g.seq2),
            f"({time.time() - t0:.1f}s)",
        )
        t0 = time.time()

    print("TPU CHECKS " + ("PASS" if not FAIL else "FAIL"), flush=True)
    sys.exit(FAIL)


if __name__ == "__main__":
    main()
