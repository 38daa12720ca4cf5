"""Wavefront (anti-diagonal) score kernel vs the row kernel: bit-exact.

ops/diag_dp.py re-evaluates the LOCAL DP in anti-diagonal order (the same
wavefront the reference's OpenCL kernel uses, opencl_sequence_alignment.rs:
358-524) to drop the X-state lane scan; scores must be bit-identical to the
row kernel (itself bit-exact vs the scan oracle / 300 EMBOSS goldens).
Runs in interpret mode on CPU.
"""

import numpy as np
import pytest

from smithwaterman_tpu.config import LOCAL
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.ops import batch, diag_dp, pallas_dp

RNG = np.random.default_rng(777)


def _scores(B, NP, MP, tile, k=24):
    sm = SubstitutionMatrix.blosum62()
    codes1 = RNG.integers(0, k, size=(B, NP)).astype(np.int32)
    codes2 = RNG.integers(0, k, size=(B, MP)).astype(np.int32)
    n = RNG.integers(1, NP + 1, size=B).astype(np.int32)
    m = RNG.integers(1, MP + 1, size=B).astype(np.int32)
    S = batch.scores_tiled(
        sm.table, codes1, codes2, as_int8=True, tile=tile, n=n, m=m
    )
    return S, n, m


def _row_best(S, n, m, og, eg):
    G, NP, tile, MP = S.shape
    nt = np.asarray(n).reshape(G, tile, 1)
    mt = np.asarray(m).reshape(G, tile, 1)
    _, stats = pallas_dp.fill_tiled(
        S, nt, mt, mode=LOCAL, og=og, eg=eg,
        score_only=True, interpret=True, masked_s=True,
    )
    return np.asarray(stats)[:, :, 0]


@pytest.mark.parametrize(
    "og,eg",
    [(-10.0, -0.5), (-12.5, -0.25), (-5.0, -2.0), (0.0, 0.0)],
)
def test_diag_matches_row_kernel(og, eg):
    S, n, m = _scores(B=16, NP=128, MP=256, tile=8)
    want = _row_best(S, n, m, og, eg)
    stats = diag_dp.fill_diag_scores(S, og=og, eg=eg, interpret=True)
    np.testing.assert_array_equal(np.asarray(stats)[:, :, 0], want)


def test_diag_rectangular_and_tiny_lengths():
    """NP > MP, NP not a multiple of the strip width, and length-1 pairs."""
    S, n, m = _scores(B=8, NP=384, MP=128, tile=8)
    n[0] = 1
    m[1] = 1
    n[2] = 384
    m[2] = 128
    S, _, _ = (
        batch.scores_tiled(
            SubstitutionMatrix.blosum62().table,
            RNG.integers(0, 24, size=(8, 384)).astype(np.int32),
            RNG.integers(0, 24, size=(8, 128)).astype(np.int32),
            as_int8=True, tile=8, n=n, m=m,
        ),
        n,
        m,
    )
    want = _row_best(S, n, m, -10.0, -0.5)
    stats = diag_dp.fill_diag_scores(S, og=-10.0, eg=-0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(stats)[:, :, 0], want)


def test_diag_rejects_open_cheaper_than_extend():
    """og > eg breaks the open-from-W fold; the API must refuse, not
    silently return wrong scores (callers fall back to the row kernel)."""
    S, n, m = _scores(B=8, NP=128, MP=128, tile=8)
    with pytest.raises(AssertionError):
        diag_dp.fill_diag_scores(S, og=0.0, eg=-1.0, interpret=True)


def _rand_seqs(count, lo, hi, seed):
    from smithwaterman_tpu.io.fasta import SeqData

    rng = np.random.default_rng(seed)
    letters = "ARNDCQEGHILKMFPSTWYV"
    out = []
    for i in range(count):
        ln = int(rng.integers(lo, hi + 1))
        out.append(SeqData(f"s{i}", "", "".join(rng.choice(list(letters), ln))))
    return out


def test_batch_aligner_diag_route():
    """score_pairs with the wavefront path on: scores match the scan backend
    across mixed buckets (64-wide ineligible -> row-kernel fallback)."""
    from smithwaterman_tpu.batch_aligner import BatchAligner

    a = _rand_seqs(6, 20, 60, 1)    # 64-bucket: diag ineligible
    b = _rand_seqs(6, 100, 250, 2)  # 128/256 buckets: diag eligible
    pairs = list(zip(a + b, b + a))
    ba_diag = BatchAligner(backend="pallas_interpret", diag_scores=True)
    ba_scan = BatchAligner(backend="scan")
    got = ba_diag.score_pairs(pairs)
    want = ba_scan.score_pairs(pairs)
    np.testing.assert_array_equal(got, want)
    # with traceback requested, diag must never engage (full results equal)
    r1 = ba_diag.align_pairs(pairs[:4])
    r2 = ba_scan.align_pairs(pairs[:4])
    for x, y in zip(r1, r2):
        assert (x.aligned1, x.aligned2, x.score) == (y.aligned1, y.aligned2, y.score)


def test_data_parallel_diag():
    """Sharded wavefront fill over the virtual mesh == single-device."""
    from smithwaterman_tpu.parallel.data_parallel import DataParallel

    dp = DataParallel(n_devices=4)
    S, n, m = _scores(B=32, NP=128, MP=128, tile=8)
    want = batch.fill_diag(S, og=-10.0, eg=-0.5, interpret=True)
    got = dp.fill_diag(S, og=-10.0, eg=-0.5, interpret=True)
    np.testing.assert_array_equal(got[:, 0], want[:, 0])


def test_skew_layout():
    """skew_scores places cell (r, c) at [strip c//128, r + c%128, c%128]."""
    G, NP, tile, MP = 1, 128, 8, 256
    S = np.arange(G * NP * tile * MP, dtype=np.int32) % 250 - 125
    S = S.reshape(G, NP, tile, MP).astype(np.int8)
    sk = np.asarray(diag_dp.skew_scores(S))
    assert sk.shape == (G, MP // 128, NP + 128, tile, 128)
    for (r, c) in [(0, 0), (5, 130), (127, 255), (63, 64)]:
        s_, l_ = c // 128, c % 128
        assert sk[0, s_, r + l_, 3, l_] == S[0, r, 3, c]
    # off-matrix cells are poisoned
    assert sk[0, 0, 0, 0, 5] == -128  # r = -5
    assert sk[0, 0, NP + 100, 0, 1] == -128  # r = NP + 99
