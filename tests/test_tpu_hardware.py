"""On-hardware checks (excluded by default; run with `-m tpu` on a TPU)."""

import pytest

pytestmark = pytest.mark.tpu


def test_golden_pair_on_tpu():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU")
    from smithwaterman_tpu import BatchAligner, LOCAL, load_fasta
    from smithwaterman_tpu.utils import oracle

    s1 = load_fasta("/root/reference/test/inputs/seq3.1.fas")[0]
    s2 = load_fasta("/root/reference/test/inputs/seq3.2.fas")[0]
    g = oracle.parse_emboss_dat("/root/reference/test/emboss_results/res3.dat")
    r = BatchAligner(mode=LOCAL, backend="pallas").align_pairs([(s1, s2)])[0]
    a1, a2 = oracle.trim_terminal(r.aligned1, r.aligned2)
    assert r.score == g.score
    assert (a1, a2) == (g.seq1, g.seq2)
