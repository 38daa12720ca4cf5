"""Scoring-matrix parity tests.

Mirrors the reference's ``sw_scoringmatrixtest``
(/root/reference/rust/sequence_alignment/src/sequence_alignment.rs:896-919)
plus parser error behavior (rs:735-794).
"""

import numpy as np
import pytest

from smithwaterman_tpu.matrices import (
    MatrixFormatError,
    PositionSpecificMatrix,
    SubstitutionMatrix,
    blosum62_table,
)


def test_load_from_lines_dna():
    lines = [
        "  A T G C \n",
        "A 1 -3 -3 -3 ",
        "T -3  1 -3 -3 ",
        "G -3  -3  1 -3 ",
        "C -3  -3  -3  1",
    ]
    sm = SubstitutionMatrix.from_lines(lines)
    for a in "ATGC":
        assert sm.get_score_str(a, a) == 1.0
    for a, b in [("A", "C"), ("T", "G"), ("G", "A"), ("C", "T")]:
        assert sm.get_score_str(a, b) == -3.0


def test_load_from_lines_comments_and_bad_values(capsys):
    lines = ["# a comment", "  A B", "A 1 zzz", "B -1 2"]
    sm = SubstitutionMatrix.from_lines(lines)
    # unparseable value -> 0 with a warning (rs:769-774)
    assert sm.get_score_str("A", "B") == 0.0
    assert sm.get_score_str("A", "A") == 1.0
    assert "can not be parsed" in capsys.readouterr().err


def test_load_from_lines_errors():
    with pytest.raises(MatrixFormatError):
        SubstitutionMatrix.from_lines(["A A", "A 1 1"])  # dup header (rs:752)
    with pytest.raises(MatrixFormatError):
        SubstitutionMatrix.from_lines(["A B", "A 1 1", "Q 1 1"])  # bad row (rs:761)
    with pytest.raises(MatrixFormatError):
        SubstitutionMatrix.from_lines(["A B", "A 1 1"])  # missing pair (rs:784)


def test_blosum62_values():
    sm = SubstitutionMatrix.blosum62()
    # spot checks against the NCBI table (rs:706-730)
    assert sm.get_score_str("A", "A") == 4.0
    assert sm.get_score_str("W", "W") == 11.0
    assert sm.get_score_str("W", "C") == -2.0
    assert sm.get_score_str("*", "*") == 1.0
    assert sm.get_score_str("A", "*") == -4.0
    assert sm.get_score_str("B", "D") == 4.0
    assert sm.get_score_str("Z", "E") == 4.0
    assert sm.get_score_str("X", "X") == -1.0
    t = blosum62_table()
    assert t.shape == (24, 24)
    assert np.array_equal(t, t.T)


def test_unknown_letter_maps_to_x():
    sm = SubstitutionMatrix.blosum62()
    # rs:669-679: unknown symbols score as X
    codes = sm.seq_to_index("AJU")
    x = sm.letter_to_index["X"]
    assert codes[1] == x and codes[2] == x
    assert codes[0] == sm.letter_to_index["A"]


def test_unknown_letter_without_x_raises():
    sm = SubstitutionMatrix.match_mismatch(5.0, -4.0)
    # A-Z matrix contains X, so lowercase still maps... build one without X
    sm2 = SubstitutionMatrix.from_lines(["A B", "A 1 -1", "B -1 1"])
    with pytest.raises(KeyError):
        sm2.seq_to_index("AQ")


def test_match_mismatch():
    sm = SubstitutionMatrix.match_mismatch(5.0, -4.0)
    assert sm.get_score_str("A", "A") == 5.0
    assert sm.get_score_str("A", "C") == -4.0
    assert sm.n_symbols == 26


def test_dense_scores():
    sm = SubstitutionMatrix.blosum62()
    c1 = sm.seq_to_index("AR")
    c2 = sm.seq_to_index("ND")
    d = sm.dense_scores(c1, c2)
    assert d.shape == (2, 2)
    assert d[0, 0] == sm.get_score_str("A", "N")
    assert d[1, 1] == sm.get_score_str("R", "D")


def test_position_specific_matrix():
    pm = PositionSpecificMatrix()
    pm.prepare("ABC", "AB")
    assert pm.scores.shape == (3, 2)
    pm.set_score(2, 1, 7.5)
    assert pm.get_score(2, 1) == 7.5
    codes = pm.seq_to_index("ABC")
    assert list(codes) == [0, 1, 2]
    # partial region truncates (rs:596-602)
    assert list(pm.seq_to_index("ABC", 2)) == [0, 1]


def test_seq_to_index_vectorized_matches_index_of():
    """The byte-LUT fast path must agree with per-char index_of,
    including the unknown->X fallback and the no-X KeyError."""
    import numpy as np
    import pytest

    sm = SubstitutionMatrix.blosum62()
    seq = "ARNDCQEGHILKMFPSTWYVBZX*?a-"
    fast = sm.seq_to_index(seq)
    slow = np.asarray([sm.index_of(c) for c in seq], dtype=np.int32)
    assert (fast == slow).all()
    assert sm.seq_to_index("").shape == (0,)

    import numpy as _np

    letters = list("ACGT")
    table = _np.full((4, 4), -1.0, _np.float32)
    _np.fill_diagonal(table, 1.0)
    no_x = SubstitutionMatrix(
        letters=letters, table=table,
        letter_to_index={c: i for i, c in enumerate(letters)},
    )
    assert (no_x.seq_to_index("ACGT") == [0, 1, 2, 3]).all()
    with pytest.raises(KeyError):
        no_x.seq_to_index("ACGU")
