#!/usr/bin/env python3
"""Regenerate (or extend) the EMBOSS golden fixture suite.

Parity target: the reference's fixture generator ``test/emboss_run.pl``
(/root/reference/test/emboss_run.pl:16-42): sample N random pairs from a
source multi-FASTA, write ``inputs/seq<i>.{1,2}.fas`` with ``>s1``/``>s2``
headers, then run EMBOSS three ways per pair with
``-gapopen 10.0 -gapextend 0.5 -datafile EBLOSUM62 -sprotein1 -sprotein2``:

  * ``needle -endweight Y`` -> ``needle_res<i>.dat``   (our GLOBAL mode)
  * ``needle``              -> ``needle_glocal_res<i>.dat`` (our GLOCAL mode)
  * ``water``               -> ``res<i>.dat``          (our LOCAL mode)

EMBOSS is the external oracle; it is not installed in every environment
(it is NOT in this image).  When ``needle``/``water`` are missing the
script reports that and exits non-zero rather than silently generating
self-referential fixtures — goldens produced by our own engine would test
self-consistency, not EMBOSS agreement (the reference's contract).

``--start`` lets the suite be EXTENDED past the checked-in 100 pairs
without touching them (new indices append to file_list.txt).

Usage:
  python scripts/regen_fixtures.py --source proteins.fas --num 100 \
      --outdir test_regen [--start 100] [--seed 0] [--dry-run]

``--dry-run`` writes the input FASTAs and prints the EMBOSS command lines
without executing them (works without EMBOSS; used by the tests).
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smithwaterman_tpu.io.fasta import load_fasta


def emboss_commands(infile1: str, infile2: str, out_global: str,
                    out_glocal: str, out_local: str,
                    needle: str = "needle", water: str = "water"):
    """The three EMBOSS invocations per pair (emboss_run.pl:40-42)."""
    common = ["-gapopen", "10.0", "-gapextend", "0.5",
              "-datafile", "EBLOSUM62", "-sprotein1", "-sprotein2"]
    return [
        [needle, "-endweight", "Y", "-asequence", infile1,
         "-bsequence", infile2, "-outfile", out_global] + common,
        [needle, "-asequence", infile1, "-bsequence", infile2,
         "-outfile", out_glocal] + common,
        [water, "-asequence", infile1, "-bsequence", infile2,
         "-outfile", out_local] + common,
    ]


def regen(source: str, outdir: str, num: int, start: int = 0, seed=None,
          needle: str = "needle", water: str = "water",
          dry_run: bool = False, run=subprocess.run) -> int:
    records = load_fasta(source)
    if not records:
        print(f"error: no sequences in {source}", file=sys.stderr)
        return 2
    indir = os.path.join(outdir, "inputs")
    resdir = os.path.join(outdir, "emboss_results")
    os.makedirs(indir, exist_ok=True)
    os.makedirs(resdir, exist_ok=True)

    if not dry_run:
        missing = [t for t in (needle, water) if shutil.which(t) is None]
        if missing:
            print(
                "error: EMBOSS tool(s) not found: " + ", ".join(missing)
                + "\nEMBOSS is the external oracle (emboss_run.pl:5-6); "
                "fixtures regenerated without it would not be golden. "
                "Install EMBOSS or use --dry-run to stage inputs only.\n"
                "NOTE: the reference warns (test/README.md:11) that needle "
                "has version-dependent behavior — the checked-in 2020-09-26 "
                "fixtures remain the source of truth for parity runs.",
                file=sys.stderr,
            )
            return 3

    rng = random.Random(seed)
    listing = []
    for i in range(start, start + num):
        ra = records[rng.randrange(len(records))]
        rb = records[rng.randrange(len(records))]
        infile1 = os.path.join(indir, f"seq{i}.1.fas")
        infile2 = os.path.join(indir, f"seq{i}.2.fas")
        # reference writes fixed >s1/>s2 headers (emboss_run.pl:31-38)
        with open(infile1, "w") as f:
            f.write(">s1\n" + ra.seq + "\n")
        with open(infile2, "w") as f:
            f.write(">s2\n" + rb.seq + "\n")
        cmds = emboss_commands(
            infile1, infile2,
            os.path.join(resdir, f"needle_res{i}.dat"),
            os.path.join(resdir, f"needle_glocal_res{i}.dat"),
            os.path.join(resdir, f"res{i}.dat"),
            needle=needle, water=water,
        )
        for cmd in cmds:
            if dry_run:
                print(" ".join(cmd))
            else:
                proc = run(cmd)
                if getattr(proc, "returncode", 0) != 0:
                    print(f"error: {' '.join(cmd)} failed", file=sys.stderr)
                    return 4
        listing.append(f"seq{i}.1.fas\tseq{i}.2.fas")

    mode = "a" if start else "w"
    with open(os.path.join(outdir, "file_list.txt"), mode) as f:
        for line in listing:
            f.write(line + "\n")
    print(f"wrote {num} pairs (indices {start}..{start + num - 1}) "
          f"under {outdir}")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--source", required=True,
                    help="multi-FASTA to sample pairs from")
    ap.add_argument("--outdir", default="test_regen")
    ap.add_argument("--num", type=int, default=100,
                    help="pairs to generate (emboss_run.pl $num_trials)")
    ap.add_argument("--start", type=int, default=0,
                    help="first pair index (use 100 to extend the suite)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--needle", default="needle")
    ap.add_argument("--water", default="water")
    ap.add_argument("--dry-run", action="store_true")
    a = ap.parse_args(argv)
    return regen(a.source, a.outdir, a.num, start=a.start, seed=a.seed,
                 needle=a.needle, water=a.water, dry_run=a.dry_run)


if __name__ == "__main__":
    raise SystemExit(main())
