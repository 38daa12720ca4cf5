"""Match-run token walks: the kernel's run bytes
(pallas_dp.fill_tiled(emit_runs=True)), the token-emitting pooled walk
(device_walk.walk_bundle_pooled_tokens), and the token rebuild
(ops/reconstruct.reconstruct_packed(tokens=True)).

The run byte at cell (i, j) is (e bits 0-3, exit-state bits 4-5): a walk
arriving in state MATCH takes 1+e diagonal steps in one iteration and
continues in the exit state; LOCAL zero cells carry the reserved
(15, STOP) marker.  Everything must stay string/score/span-exact vs the
host walk — tokens change the serial iteration count, never the path.
"""

import numpy as np
import pytest

import smithwaterman_tpu as swt
from smithwaterman_tpu.ops import device_walk as dw

LETTERS = "ARNDCQEGHILKMFPSTWYV"


def _ref_runs(tb):
    """Scalar reference of the kernel's run-byte recurrence (see the
    run-byte comment in pallas_dp._kernel)."""
    NP, MP = tb.shape
    e = np.zeros((NP, MP), np.int32)
    x = np.zeros_like(e)
    pm = tb & 3
    for i in range(NP):
        for j in range(MP):
            ed = e[i - 1, j - 1] if (i > 0 and j > 0) else 15
            xd = x[i - 1, j - 1] if (i > 0 and j > 0) else 0
            p = int(pm[i, j])
            if p == 3:
                e[i, j], x[i, j] = 15, 3
            elif p != 0:
                e[i, j], x[i, j] = 0, p
            else:
                cap = 14 if xd == 3 else 15  # keep (15, STOP) reserved
                if ed == 15 and xd == 3:
                    e[i, j], x[i, j] = 0, 3
                elif ed < cap:
                    e[i, j], x[i, j] = ed + 1, xd
                else:
                    e[i, j], x[i, j] = 0, 0
    return (e | (x << 4)).astype(np.uint8)


@pytest.mark.parametrize("mode", [swt.LOCAL, swt.GLOBAL, swt.GLOCAL])
def test_run_bytes_match_reference_recurrence(mode):
    import jax.numpy as jnp

    from smithwaterman_tpu.matrices import SubstitutionMatrix
    from smithwaterman_tpu.ops import batch as batch_ops
    from smithwaterman_tpu.ops import pallas_dp

    sm = SubstitutionMatrix.blosum62()
    rng = np.random.default_rng(3 + mode)
    B, NP, MP, tile = 8, 64, 128, 8
    codes1 = np.zeros((B, NP), np.int8)
    codes2 = np.zeros((B, MP), np.int8)
    n = np.ones(B, np.int32)
    m = np.ones(B, np.int32)
    for k in range(B):
        n[k] = rng.integers(30, NP + 1)
        m[k] = rng.integers(30, MP + 1)
        a = "".join(rng.choice(list(LETTERS), n[k]))
        codes1[k, : n[k]] = sm.seq_to_index(a)
        # half the pairs share a long identical run: chains >= 16 exist,
        # covering the cap and the reserved-marker collision case
        b = ("WWW" + a * 4)[: m[k]] if k < B // 2 else \
            "".join(rng.choice(list(LETTERS), m[k]))
        codes2[k, : m[k]] = sm.seq_to_index(b)
    table = jnp.asarray(np.asarray(sm.table, np.float32))
    S = batch_ops.scores_tiled(table, codes1, codes2, as_int8=True,
                               tile=tile)
    nt = jnp.asarray(n.reshape(1, tile, 1))
    mt = jnp.asarray(m.reshape(1, tile, 1))
    tb0, st0 = pallas_dp.fill_tiled(
        S, nt, mt, mode=mode, og=-10.0, eg=-0.5, interpret=True)
    tb1, run1, st1 = pallas_dp.fill_tiled(
        S, nt, mt, mode=mode, og=-10.0, eg=-0.5, interpret=True,
        emit_runs=True)
    tb0, tb1, run1 = map(np.asarray, (tb0, tb1, run1))
    assert np.array_equal(tb0, tb1)  # tb bytes untouched by the flag
    assert np.array_equal(np.asarray(st0), np.asarray(st1))
    saw_long = False
    for k in range(B):
        exp = _ref_runs(tb0[0, :, k, :])
        assert np.array_equal(exp, run1[0, :, k, :]), k
        saw_long |= bool((exp & 15).max() == 15)
    assert saw_long  # the cap/collision cases were actually exercised


def _rand_pairs(rng, n_pairs, lo=3, hi=150, runs=False):
    def rseq(n):
        return "".join(rng.choice(list(LETTERS), n))

    out = []
    for _ in range(n_pairs):
        a = rseq(rng.integers(lo, hi))
        if runs and rng.random() < 0.5:
            b = ("WW" + a * 2)[: rng.integers(lo, hi)]
        else:
            b = rseq(rng.integers(lo, hi))
        out.append((a, b))
    return out


def _fields(r):
    return (r.aligned1, r.aligned2, r.score,
            r.start1, r.end1, r.start2, r.end2)


@pytest.mark.parametrize("mode", [swt.LOCAL, swt.GLOBAL, swt.GLOCAL])
@pytest.mark.parametrize("retain", [True, False])
def test_token_walk_matches_host(mode, retain, monkeypatch):
    monkeypatch.setenv("SWTPU_TOKEN_WALK", "1")
    rng = np.random.default_rng(mode * 2 + retain + 29)
    pairs = _rand_pairs(rng, 18, lo=3, hi=220, runs=True)
    pairs.append(("AAAA", "WWWW"))
    pairs.append(("A", "A"))
    pairs.append((LETTERS * 3, LETTERS * 3))  # pure 60-long match run
    tok = swt.BatchAligner(mode=mode, backend="pallas_interpret",
                           device_walk=True).align_pairs(
        pairs, retain_all=retain)
    host = swt.BatchAligner(mode=mode, backend="pallas_interpret",
                            device_walk=False).align_pairs(
        pairs, retain_all=retain)
    for t, h in zip(tok, host):
        assert _fields(t) == _fields(h)


def test_token_walk_off_restores_move_streams(monkeypatch):
    monkeypatch.setenv("SWTPU_TOKEN_WALK", "0")
    rng = np.random.default_rng(41)
    pairs = _rand_pairs(rng, 8, runs=True)
    off = swt.BatchAligner(mode=swt.LOCAL, backend="pallas_interpret",
                           device_walk=True).align_pairs(pairs)
    monkeypatch.setenv("SWTPU_TOKEN_WALK", "1")
    on = swt.BatchAligner(mode=swt.LOCAL, backend="pallas_interpret",
                          device_walk=True).align_pairs(pairs)
    for a, b in zip(off, on):
        assert _fields(a) == _fields(b)


def test_token_rebuild_python_fallback(monkeypatch):
    from smithwaterman_tpu.ops import reconstruct as recon

    monkeypatch.setenv("SWTPU_TOKEN_WALK", "1")
    rng = np.random.default_rng(53)
    pairs = _rand_pairs(rng, 8, lo=2, hi=120, runs=True)
    native = swt.BatchAligner(mode=swt.GLOCAL, backend="pallas_interpret",
                              device_walk=True).align_pairs(pairs)
    monkeypatch.setattr(recon, "_lib", lambda: None)
    fallback = swt.BatchAligner(mode=swt.GLOCAL, backend="pallas_interpret",
                                device_walk=True).align_pairs(pairs)
    for a, b in zip(native, fallback):
        assert _fields(a) == _fields(b)


def test_tokens_to_states_expansion():
    toks = np.array([[0 | (3 << 2)], [2 | (0 << 2)], [1 | (0 << 2)]],
                    np.uint8)
    s = dw.tokens_to_states(toks[:, 0], 3)
    assert s.tolist() == [0, 0, 0, 0, 2, 1]
