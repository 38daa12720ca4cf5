"""FASTA parser edge-case tests.

Covers the same quirks the reference's ``sw_fastaloadtest`` exercises with
its fixture ``rust/sequence_alignment/test/test1.fas``
(/root/reference/rust/sequence_alignment/src/sequence_alignment.rs:1089-1130):
headers with a ``>`` not at column 0, bare ``>`` records dropped, records
with a name but no sequence kept, blank lines, name/desc splitting.
"""

import os

from smithwaterman_tpu.io.fasta import SeqData, load_fasta, parse_fasta, write_fasta

EDGE_FIXTURE = """>recA
QWERTYQWERTY

>recB the b one
KLMNPQ
KLMNPQ


> recC the c one
CCCCCCCCCCCC

>

 > recD the d one

 > recE the e one
EEEEEEEEEEEE

 > F
FFFFFFFFFFFF

 >G
GGGGGGGGGGGG

 >H h
HHHHHHHHHHHH


>I"""


def test_edge_cases(tmp_path, capsys):
    p = tmp_path / "edge.fas"
    p.write_text(EDGE_FIXTURE)
    recs = load_fasta(str(p))
    names = [r.name for r in recs]
    assert names == ["recA", "recB", "recC", "recD", "recE", "F", "G", "H", "I"]
    assert recs[0].desc == "" and recs[0].seq == "QWERTYQWERTY"
    assert recs[1].desc == "the b one" and recs[1].seq == "KLMNPQKLMNPQ"
    assert recs[2].desc == "the c one"
    # record with a name but no sequence is kept with empty seq
    assert recs[3].seq == ""
    assert recs[4].seq == "E" * 12
    assert recs[5].desc == "" and recs[5].seq == "F" * 12
    assert recs[7].desc == "h"
    assert recs[8].seq == ""
    # header-not-at-column-0 warning (rs:850)
    assert "used as header anyway" in capsys.readouterr().err


def test_bare_gt_record_dropped(tmp_path):
    p = tmp_path / "bare.fas"
    p.write_text(">\n\n>ok\nAAA\n")
    recs = load_fasta(str(p))
    assert len(recs) == 1 and recs[0].name == "ok"


def test_case_preserved_and_whitespace_removed():
    recs = parse_fasta([">x", "a C g\t t"])
    assert recs[0].seq == "aCgt"


def test_seqdata_create_retain_ws():
    # parity: SeqData::create (rs:808-821)
    s = SeqData.create("n", "d", "AB\r\nCD", retain_ws=True)
    assert s.seq == "ABCD"
    s2 = SeqData.create("n", "d", "AB CD", retain_ws=True)
    assert s2.seq == "AB CD"
    s3 = SeqData.create("n", "d", "AB CD", retain_ws=False)
    assert s3.seq == "ABCD"


def test_roundtrip(tmp_path):
    p = tmp_path / "rt.fas"
    write_fasta(str(p), [SeqData("a", "d1", "ACGT"), SeqData("b", "", "GGG")])
    recs = load_fasta(str(p))
    assert [(r.name, r.seq) for r in recs] == [("a", "ACGT"), ("b", "GGG")]


def test_reference_fixture_if_present():
    ref = "/root/reference/rust/sequence_alignment/test/test1.fas"
    if not os.path.exists(ref):
        return
    recs = load_fasta(ref)
    assert [r.name for r in recs] == [
        "seqA", "seqB", "seqC", "seqD", "seqE", "F", "G", "H", "I",
    ]
    assert recs[0].seq == "A" * 12
    assert recs[3].seq == "" and recs[3].desc == "d desu"
    assert recs[8].seq == ""


def test_native_parser_differential(tmp_path, capsys):
    """csrc/fasta.cpp must match parse_fasta byte-for-byte, warnings
    included, across the quirk corpus (native used by load_fasta)."""
    import io
    import sys

    from smithwaterman_tpu.io import fasta as fmod

    lib = fmod._native_lib()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    cases = [
        EDGE_FIXTURE,
        "no header\nACGT\n>x\n\n>\nAC\n",
        "  >lead\nAA\nmid>line h\nCC\n",
        ">a  two  spaces in desc\nA C\tG\n",
        ">\n>\n>b\n",
        "",
        "ACGT",
        ">crlf test\r\nAC\r\nGT\r\n",
        ">lonecr\rAC\rGT\r",
        ">tab\tdesc\tmore\nACGT\n",
    ]
    for retain in (False, True):
        for k, content in enumerate(cases):
            p = tmp_path / f"c{k}_{retain}.fas"
            p.write_bytes(content.encode())
            with open(p, "r") as fh:
                py = fmod.parse_fasta(fh, retain_ws=retain)
            err_py = capsys.readouterr().err
            nat = fmod._load_fasta_native(lib, str(p), retain)
            err_nat = capsys.readouterr().err
            assert [(r.name, r.desc, r.seq) for r in py] == [
                (r.name, r.desc, r.seq) for r in nat
            ], (k, retain)
            assert err_py == err_nat, (k, retain)
