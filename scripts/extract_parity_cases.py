#!/usr/bin/env python3
"""Extract the EMBOSS-derived expectation data embedded in the reference's
unit tests into tests/data/parity_cases.json.

The reference asserts exact scores and aligned strings (obtained from EBI
EMBOSS runs) for a set of DNA/protein pairs
(/root/reference/rust/sequence_alignment/src/sequence_alignment.rs:920-1221,
/root/reference/rust/sa_opencl/src/opencl_sequence_alignment.rs:1429-1448).
Those expectations are behavioral test *data* (the oracle), not code; this
script pulls them out mechanically so our tests assert the same contract.
"""

import json
import os
import re

RS = "/root/reference/rust/sequence_alignment/src/sequence_alignment.rs"
RS_OCL = "/root/reference/rust/sa_opencl/src/opencl_sequence_alignment.rs"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data", "parity_cases.json")

SEQ_RE = re.compile(r'let (seq[12])_ = "([A-Z]+)"\.to_(?:string|owned)\(\)')
SCORE_RE = re.compile(r"assert_eq!\(res\.2\s*,\s*([0-9.\-]+)\)")
STR_RE = re.compile(r'assert_eq!\((r[12])\s*,\s*"([A-Za-z\-]*)"\)')
ALIGN_RE = re.compile(r"\.align\(")
MODE_RE = re.compile(r"SequenceAlignment::new\([^,]*,\s*([0-9.]+)\s*,\s*([0-9.]+)\s*,\s*(ALIGN_\w+)\)")


def events(path, start_marker, end_marker):
    src = open(path).read()
    lo = src.index(start_marker)
    hi = src.index(end_marker, lo) if end_marker else len(src)
    evs = []
    for line in src[lo:hi].splitlines():
        line = line.strip()
        if line.startswith("//"):
            continue
        m = SEQ_RE.search(line)
        if m:
            evs.append(("seq", m.group(1), m.group(2)))
            continue
        m = MODE_RE.search(line)
        if m:
            evs.append(("params", float(m.group(1)), float(m.group(2)), m.group(3)))
        if ALIGN_RE.search(line) and "fn " not in line and "let res" in line:
            evs.append(("align",))
            continue
        m = SCORE_RE.search(line)
        if m:
            evs.append(("score", float(m.group(1))))
            continue
        m = STR_RE.search(line)
        if m:
            evs.append(("aln", m.group(1), m.group(2)))
    return evs


def assemble(evs, matrix, default_params):
    """Fold a linear event stream into one case per align() call."""
    cases = []
    seq1 = seq2 = None
    go, ge, mode = default_params
    cur = None
    for ev in evs:
        if ev[0] == "seq":
            if ev[1] == "seq1":
                seq1 = ev[2]
            else:
                seq2 = ev[2]
        elif ev[0] == "params":
            go, ge, mode = ev[1], ev[2], ev[3]
        elif ev[0] == "align":
            cur = {
                "matrix": matrix,
                "seq1": seq1,
                "seq2": seq2,
                "gap_open": go,
                "gap_extend": ge,
                "mode": mode.replace("ALIGN_", "").lower(),
                "score": None,
                "aligned1": None,
                "aligned2": None,
            }
            cases.append(cur)
        elif ev[0] == "score":
            cur["score"] = ev[1]
        elif ev[0] == "aln":
            cur["aligned1" if ev[1] == "r1" else "aligned2"] = ev[2]
    return cases


def main():
    out = {}
    out["dna"] = assemble(
        events(RS, "fn sw_aligntest()", "fn sw_aligntest2()"),
        "mat_5_-4",
        (10.0, 0.5, "ALIGN_LOCAL"),
    )
    out["protein"] = assemble(
        events(RS, "fn sw_aligntest2()", "fn psm_test()"),
        "blosum62",
        (10.0, 0.5, "ALIGN_GLOCAL"),
    )
    out["psm"] = assemble(
        events(RS, "fn psm_test()", "fn sw_fastaloadtest()"),
        "psm_from_blosum62",
        (10.0, 0.5, "ALIGN_GLOCAL"),
    )
    out["gap_sensitivity"] = assemble(
        events(RS, "fn sw_aligntest3()", None),
        "blosum62",
        (10.0, 0.5, "ALIGN_GLOCAL"),
    )
    # OpenCL-only extra: BLOSUM62 x10, go=100 ge=5, local, retain_all=false
    ocl = assemble(
        events(RS_OCL, "*vvv *= 10.0", "\n}"),
        "blosum62_x10",
        (100.0, 5.0, "ALIGN_LOCAL"),
    )
    for c in ocl:
        c["retain_all"] = False
    out["scaled_local"] = ocl

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    for k, v in out.items():
        print(k, len(v), [c["mode"] for c in v])


if __name__ == "__main__":
    main()
