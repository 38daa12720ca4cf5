"""String-exact checks against the reference's EMBOSS golden fixtures
(/root/reference/test/emboss_results/), applying the comparison rules of
check_results.pl (trimTerminal for local, J/U/Z/B/O/X tolerance).

A representative subset runs in CI; the full 100x3 sweep is
scripts/run_golden.py (and the `full_golden` marker here).
"""

import os

import pytest

from smithwaterman_tpu import GLOBAL, GLOCAL, LOCAL, Aligner, load_fasta
from smithwaterman_tpu.utils import oracle

MODES = {"local": LOCAL, "glocal": GLOCAL, "global": GLOBAL}

if not os.path.isdir(oracle.REFERENCE_TEST_DIR):
    pytest.skip("reference fixtures unavailable", allow_module_level=True)

SUITE = oracle.default_suite()
# spread across the suite: different lengths, both parities
SUBSET = [SUITE[i] for i in range(0, len(SUITE), 9)]


def check_case(case, mode_name, aligner):
    s1 = load_fasta(case.fasta1)[0]
    s2 = load_fasta(case.fasta2)[0]
    g = oracle.parse_emboss_dat(case.golden[mode_name])
    r = aligner.align(s1, s2, True)
    a1, a2 = r.aligned1, r.aligned2
    if mode_name == "local":
        a1, a2 = oracle.trim_terminal(a1, a2)
    if (a1, a2) != (g.seq1, g.seq2):
        assert oracle.is_tolerated(a1, a2), (
            f"{case.tag} {mode_name}:\nours  ={a1[:100]}\ngolden={g.seq1[:100]}"
        )
    if g.score is not None:
        assert abs(r.score - g.score) < 1e-4


@pytest.mark.parametrize("mode_name", ["local", "glocal", "global"])
@pytest.mark.parametrize("case", SUBSET, ids=[c.tag for c in SUBSET])
def test_golden_subset(case, mode_name):
    check_case(case, mode_name, Aligner(mode=MODES[mode_name]))


@pytest.mark.full_golden
@pytest.mark.parametrize("mode_name", ["local", "glocal", "global"])
def test_golden_full(mode_name):
    aligner = Aligner(mode=MODES[mode_name])
    for case in SUITE:
        check_case(case, mode_name, aligner)
