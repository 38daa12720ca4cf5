"""Alignment parity tests against the reference's EMBOSS-derived unit-test
expectations (extracted into tests/data/parity_cases.json by
scripts/extract_parity_cases.py from
/root/reference/rust/sequence_alignment/src/sequence_alignment.rs:920-1221 and
/root/reference/rust/sa_opencl/src/opencl_sequence_alignment.rs:1429-1448).

Every case asserts the exact score and/or the exact aligned strings."""

import json
import os

import numpy as np
import pytest

from smithwaterman_tpu import (
    GLOBAL,
    GLOCAL,
    LOCAL,
    Aligner,
    PositionSpecificMatrix,
    SubstitutionMatrix,
)

DATA = os.path.join(os.path.dirname(__file__), "data", "parity_cases.json")
MODES = {"local": LOCAL, "glocal": GLOCAL, "global": GLOBAL}

with open(DATA) as f:
    CASES = json.load(f)


def make_matrix(name):
    if name == "blosum62":
        return SubstitutionMatrix.blosum62()
    if name == "mat_5_-4":
        return SubstitutionMatrix.match_mismatch(5.0, -4.0)
    if name == "blosum62_x10":
        sm = SubstitutionMatrix.blosum62()
        sm.table = sm.table * 10.0
        return sm
    raise ValueError(name)


def run_case(case):
    sm = make_matrix(case["matrix"])
    a = Aligner(
        scoring_matrix=sm,
        gap_open=case["gap_open"],
        gap_extend=case["gap_extend"],
        mode=MODES[case["mode"]],
    )
    r = a.align(case["seq1"], case["seq2"], case.get("retain_all", True))
    if case["score"] is not None:
        assert r.score == pytest.approx(case["score"], abs=1e-4), (
            f"score {r.score} != {case['score']}"
        )
    if case["aligned1"] is not None:
        assert r.aligned1 == case["aligned1"]
        assert r.aligned2 == case["aligned2"]
    return r


@pytest.mark.parametrize("idx", range(len(CASES["dna"])))
def test_dna(idx):
    run_case(CASES["dna"][idx])


@pytest.mark.parametrize("idx", range(len(CASES["protein"])))
def test_protein(idx):
    run_case(CASES["protein"][idx])


@pytest.mark.parametrize("idx", range(len(CASES["gap_sensitivity"])))
def test_gap_sensitivity(idx):
    run_case(CASES["gap_sensitivity"][idx])


@pytest.mark.parametrize("idx", range(len(CASES["scaled_local"])))
def test_scaled_local_trimmed(idx):
    """BLOSUM62 x10, go=100/ge=5, retain_all=False (OpenCL-only extra test)."""
    run_case(CASES["scaled_local"][idx])


def test_psm_reproduces_blosum62():
    """PositionSpecificMatrix filled from BLOSUM62 reproduces the letter-matrix
    result (parity: psm_test, rs:1056-1086)."""
    case = CASES["psm"][0]
    sm = SubstitutionMatrix.blosum62()
    pm = PositionSpecificMatrix()
    s1, s2 = case["seq1"], case["seq2"]
    pm.prepare(s1, s2)
    c1 = sm.seq_to_index(s1)
    c2 = sm.seq_to_index(s2)
    pm.scores = sm.table[np.ix_(c1, c2)].astype(np.float32)
    a = Aligner(scoring_matrix=pm, gap_open=10.0, gap_extend=0.5, mode=GLOCAL)
    r = a.align(s1, s2, True)
    assert r.score == pytest.approx(case["score"], abs=1e-4)
    assert r.aligned1 == case["aligned1"]
    assert r.aligned2 == case["aligned2"]


def test_score_only_matches_full():
    case = CASES["dna"][0]
    a = Aligner(
        scoring_matrix=SubstitutionMatrix.match_mismatch(5.0, -4.0),
        mode=LOCAL,
    )
    assert a.score(case["seq1"], case["seq2"]) == pytest.approx(54.5)


def test_partial_region():
    """align_partial restricts to prefixes (rs:393-403)."""
    a = Aligner(mode=LOCAL)
    s1, s2 = "HEAGAWGHEE", "PAWHEAE"
    full = a.align(s1[:6], s2[:5], True)
    part = a.align_partial(s1, s2, True, partial_region=(6, 5))
    assert part.score == full.score
    assert part.aligned1 == full.aligned1


def test_empty_sequences():
    a = Aligner(mode=LOCAL)
    r = a.align("", "AAA", True)
    assert r.score == 0.0
    assert r.aligned1 == "---" and r.aligned2 == "AAA"
    g = Aligner(mode=GLOBAL)
    rg = g.align("AA", "", True)
    # global: terminal gaps charged: open + 2 extends with go=10, ge=0.5
    assert rg.score == pytest.approx(-(10.0 + 0.5))
    gl = Aligner(mode=GLOCAL)
    rgl = gl.align("AA", "", True)
    assert rgl.score == 0.0


def test_align_fasta_text_overload():
    """Raw FASTA text accepted directly (Java align(String,String) parity,
    SmithWaterman.java:41-66)."""
    a = Aligner(mode=LOCAL)
    r = a.align_fasta(">q desc\nHEAGAW\nGHEE\n", ">t\nPAWHEAE\n")
    w = a.align("HEAGAWGHEE", "PAWHEAE")
    assert (r.score, r.aligned1, r.aligned2) == (w.score, w.aligned1, w.aligned2)
    # plain sequence text (no header) also works
    r2 = a.align_fasta("HEAGAWGHEE", "PAWHEAE")
    assert r2.score == w.score


def test_align_files(tmp_path):
    f1 = tmp_path / "a.fas"
    f2 = tmp_path / "b.fas"
    f1.write_text(">x\nHEAGAWGHEE\n>y\nWWW\n")
    f2.write_text(">z\nPAWHEAE\n")
    a = Aligner(mode=LOCAL)
    out = list(a.align_files(str(f1), str(f2)))
    assert len(out) == 2
    assert out[0][0].name == "x" and out[0][1].name == "z"
    assert out[0][2].score == a.align("HEAGAWGHEE", "PAWHEAE").score
