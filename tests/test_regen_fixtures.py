"""Fixture-regeneration parity (reference test/emboss_run.pl:16-42).

EMBOSS is not installed here, so we test the staging behavior: input
FASTAs written with >s1/>s2 headers, the exact EMBOSS command lines, the
file_list extension mode, and the hard refusal to fabricate goldens
without EMBOSS.
"""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import regen_fixtures  # noqa: E402

SRC = os.path.join(os.path.dirname(__file__), "data", "regen_src.fas")


@pytest.fixture(scope="module", autouse=True)
def _source_fasta():
    os.makedirs(os.path.dirname(SRC), exist_ok=True)
    with open(SRC, "w") as f:
        f.write(">a desc\nMKV\n>b\nACDEFGHIKLMNPQRSTVWY\n>c\nPEPTIDE\n")
    yield
    os.remove(SRC)


def test_dry_run_stages_inputs_and_commands(tmp_path, capsys):
    rc = regen_fixtures.regen(SRC, str(tmp_path), num=3, seed=7,
                              dry_run=True)
    assert rc == 0
    out = capsys.readouterr().out
    # three EMBOSS invocations per pair, exact flags of emboss_run.pl:40-42
    assert out.count("-datafile EBLOSUM62") == 9
    assert out.count("needle -endweight Y") == 3
    assert out.count("water -asequence") == 3
    assert "-gapopen 10.0 -gapextend 0.5" in out
    assert "-sprotein1 -sprotein2" in out
    for i in range(3):
        p1 = tmp_path / "inputs" / f"seq{i}.1.fas"
        p2 = tmp_path / "inputs" / f"seq{i}.2.fas"
        assert p1.read_text().startswith(">s1\n")
        assert p2.read_text().startswith(">s2\n")
    listing = (tmp_path / "file_list.txt").read_text().splitlines()
    assert listing[0] == "seq0.1.fas\tseq0.2.fas"
    assert len(listing) == 3


def test_extend_appends_past_existing_suite(tmp_path):
    assert regen_fixtures.regen(SRC, str(tmp_path), num=2, seed=1,
                                dry_run=True) == 0
    assert regen_fixtures.regen(SRC, str(tmp_path), num=2, start=2, seed=2,
                                dry_run=True) == 0
    listing = (tmp_path / "file_list.txt").read_text().splitlines()
    assert listing == [
        "seq0.1.fas\tseq0.2.fas", "seq1.1.fas\tseq1.2.fas",
        "seq2.1.fas\tseq2.2.fas", "seq3.1.fas\tseq3.2.fas",
    ]
    assert (tmp_path / "inputs" / "seq3.2.fas").exists()


def test_refuses_to_fabricate_goldens_without_emboss(tmp_path, capsys):
    rc = regen_fixtures.regen(SRC, str(tmp_path), num=1,
                              needle="definitely-not-needle-xyz",
                              water="definitely-not-water-xyz")
    assert rc == 3
    assert "external oracle" in capsys.readouterr().err


def test_runs_emboss_when_available(tmp_path):
    calls = []

    def fake_run(cmd):
        calls.append(cmd)
        # emulate EMBOSS writing its outfile
        out = cmd[cmd.index("-outfile") + 1]
        with open(out, "w") as f:
            f.write("# fake emboss output\n")
        return subprocess.CompletedProcess(cmd, 0)

    rc = regen_fixtures.regen(SRC, str(tmp_path), num=2, seed=0,
                              needle="true", water="true", run=fake_run)
    assert rc == 0
    assert len(calls) == 6
    res = tmp_path / "emboss_results"
    for i in range(2):
        assert (res / f"needle_res{i}.dat").exists()
        assert (res / f"needle_glocal_res{i}.dat").exists()
        assert (res / f"res{i}.dat").exists()
