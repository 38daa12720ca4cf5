"""Sequence-tiled (column-sharded) fill vs the single-device scan fill:
scores must be bit-identical across an 8-device mesh."""

import numpy as np
import pytest

from smithwaterman_tpu.config import GLOBAL, GLOCAL, LOCAL
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.ops import batch
from smithwaterman_tpu.parallel import make_mesh
from smithwaterman_tpu.parallel.seq_tiled import striped_fill

RNG = np.random.default_rng(17)
B, NP, MP = 3, 256, 256
OG, EG = -10.0, -0.5


def _data():
    sm = SubstitutionMatrix.blosum62()
    codes1 = RNG.integers(0, 24, size=(B, NP)).astype(np.int32)
    codes2 = RNG.integers(0, 24, size=(B, MP)).astype(np.int32)
    n = np.array([256, 200, 129], dtype=np.int32)
    m = np.array([256, 131, 256], dtype=np.int32)
    S = np.stack(
        [sm.dense_scores(codes1[b], codes2[b]) for b in range(B)]
    ).astype(np.float32)
    return S, n, m


@pytest.mark.parametrize("mode", [LOCAL, GLOCAL, GLOBAL])
@pytest.mark.parametrize("block_rows", [32, 256])
def test_striped_matches_scan(mode, block_rows):
    import jax

    mesh = make_mesh(8)
    S, n, m = _data()
    got = np.asarray(
        striped_fill(
            S, n, m, mode=mode, og=OG, eg=EG, block_rows=block_rows, mesh=mesh
        )
    )
    ref = batch.fill_scan(S, n, m, mode=mode, og=OG, eg=EG, score_only=True)
    if mode == LOCAL:
        np.testing.assert_array_equal(got, np.asarray(ref.best))
    else:
        np.testing.assert_array_equal(got, np.asarray(ref.final))
