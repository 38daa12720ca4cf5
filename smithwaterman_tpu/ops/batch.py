"""Batched device pipeline: substitution-score precompute + tiled DP fill.

The reference aligns pairs one at a time in a host loop
(/root/reference/rust/sequence_alignment/src/main.rs:35-44); the TPU-native
pipeline instead pads pairs into (npad, mpad) length buckets and runs
``TB``-pair tiles through one fused device program:

  1. ``scores_tiled``: dense substitution scores for every pair.  For
     integer tables (BLOSUM62, match/mismatch — the common case) this is a
     one-hot matmul on the MXU emitting int8, i.e. 1 byte/cell of HBM; for
     arbitrary float tables it is an exact gather emitting f32.
  2. ``ops.pallas_dp.fill_tiled``: the Pallas fill kernel (VPU).
  3. Host traceback per pair (``ops.traceback.walk_tiled``).

A vmapped ``ops.scan_dp.fill`` provides the same contract on any backend
(CPU tests, correctness cross-checks).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import pallas_dp, scan_dp
from .pallas_dp import DEFAULT_TILE_PAIRS, TB


def is_integer_table(table: np.ndarray) -> bool:
    return bool(
        np.all(table == np.round(table))
        and np.all(np.abs(table) <= 127)
    )


@functools.partial(jax.jit, static_argnames=("as_int8", "tile"))
def scores_tiled(table, codes1, codes2, *, as_int8: bool, tile: int = DEFAULT_TILE_PAIRS,
                 n=None, m=None):
    """Dense substitution scores, tiled for the fill kernel.

    Args:
      table: (K, K) f32 scoring table.
      codes1: (B, NP) integer symbol codes (padded with 0; int8 from the
        batch pipeline — the codes H2D transfer dominates device-path
        cost on slow links, so 1 byte/symbol matters).
      codes2: (B, MP) integer codes.
      tile: pairs per kernel tile (B must be a multiple).
      n, m: optional (B,) true lengths.  When given, padded cells (row
        >= n or col >= m) are set to the dtype's "poison" score (-128
        int8 / -1e9 f32) so the kernel's LOCAL score-only path can skip
        its per-row argmax mask (``masked_s=True``): one poisoned
        substitution drags M at least 128 below the running best (M-state
        values are bounded by the best + max entry), so padded cells can
        never raise the best score.  Argmax *positions* are exact too for
        non-empty pairs (n, m >= 1) — see the masked_s proof in
        pallas_dp._kernel — so traceback fills use the fast path as well.
    Returns:
      (G, NP, tile, MP) int8 (as_int8) or f32, G = B // tile.
    """
    B, NP = codes1.shape
    MP = codes2.shape[1]
    K = table.shape[0]
    prof = jnp.take(table, codes1, axis=0)  # (B, NP, K)
    if as_int8:
        # one-hot matmul on the MXU; exact for integer tables (|v| <= 127:
        # both bf16 products and f32 accumulation are exact).
        oh2 = jax.nn.one_hot(codes2, K, dtype=jnp.float32)  # (B, MP, K)
        S = jnp.einsum(
            "bik,bjk->bij", prof, oh2, preferred_element_type=jnp.float32
        )
        S = S.astype(jnp.int8)
    else:
        # exact gather path for arbitrary float tables
        idx = jnp.broadcast_to(codes2[:, None, :], (B, NP, MP))
        S = jnp.take_along_axis(prof, idx, axis=2)
    if n is not None:
        poison = jnp.asarray(-128 if as_int8 else -1.0e9, S.dtype)
        ri = jax.lax.broadcasted_iota(jnp.int32, (B, NP, MP), 1)
        ci = jax.lax.broadcasted_iota(jnp.int32, (B, NP, MP), 2)
        pad = (ri >= jnp.asarray(n)[:, None, None]) | (
            ci >= jnp.asarray(m)[:, None, None]
        )
        S = jnp.where(pad, poison, S)
    G = B // tile
    S = S.reshape(G, tile, NP, MP).transpose(0, 2, 1, 3)
    return S


def dense_to_tiled(S_dense, tile: int = DEFAULT_TILE_PAIRS):
    """(B, NP, MP) dense scores -> (G, NP, tile, MP) kernel layout."""
    B, NP, MP = S_dense.shape
    G = B // tile
    return S_dense.reshape(G, tile, NP, MP).transpose(0, 2, 1, 3)


def fill_diag(
    S_tiled,
    *,
    og: float,
    eg: float,
    interpret: bool = False,
) -> np.ndarray:
    """LOCAL score-only fill via the wavefront kernel (ops/diag_dp.py).

    Same ``stats (B, 8)`` host contract as ``fill_pallas(score_only=True)``
    except only ``stats[:, 0]`` (best score) is populated — no argmax
    coordinates, which score-only consumers never read.  Callers must
    check ``diag_dp.eligible`` first.
    """
    from . import diag_dp

    stats = diag_dp.fill_diag_scores(
        S_tiled, og=float(og), eg=float(eg), interpret=interpret
    )
    G, tbp, W = stats.shape
    return np.asarray(stats).reshape(G * tbp, W)


def fill_pallas(
    S_tiled,
    n: np.ndarray,
    m: np.ndarray,
    *,
    mode: int,
    og: float,
    eg: float,
    score_only: bool = False,
    interpret: bool = False,
    masked_s: bool = False,
) -> Tuple[Optional[np.ndarray], np.ndarray]:
    """Run the Pallas kernel; returns host arrays (tb_tiled, stats (B, 8))."""
    G, NP, tile, MP = S_tiled.shape
    n = np.asarray(n)
    m = np.asarray(m)
    nt = jnp.asarray(n.reshape(G, tile, 1), jnp.int32)
    mt = jnp.asarray(m.reshape(G, tile, 1), jnp.int32)
    tb, stats = pallas_dp.fill_tiled(
        S_tiled,
        nt,
        mt,
        mode=mode,
        og=float(og),
        eg=float(eg),
        score_only=score_only,
        interpret=interpret,
        masked_s=masked_s,
    )
    stats_np = np.asarray(stats).reshape(G * tile, pallas_dp.STATS_W)
    if tb is None:
        return None, stats_np
    # slice to the bucket's true max lengths on-device before the (possibly
    # tunnel-bound) device->host copy; rows to a sublane multiple, cols to a
    # lane multiple
    max_n = min(NP, -(-int(n.max()) // 8) * 8)
    max_m = min(MP, -(-int(m.max()) // 128) * 128)
    if max_n < NP or max_m < MP:
        tb = tb[:, :max_n, :, :max_m]
    return np.asarray(tb), stats_np


class PendingFill:
    """A dispatched-but-not-fetched kernel run (see fill_pallas_async).

    ``pieces`` are DEVICE arrays jointly covering pairs [0, count): the
    full tile groups, plus (if count is not a tile multiple) the used
    sublanes of the last group.  ``fetch()`` forces the device->host
    copies and returns ``(get_tb, stats (B, 8))`` where ``get_tb(k)``
    yields the (max_n, max_m) pointer view of pair ``k``.
    """

    def __init__(self, pieces, stats_dev, tile, count, B, gf=0):
        self.pieces = pieces
        self.stats_dev = stats_dev
        self.tile = tile
        self.count = count
        self.B = B
        self.gf = gf  # number of FULL tile groups in pieces[0]

    def fetch(self):
        stats = np.asarray(self.stats_dev).reshape(self.B, pallas_dp.STATS_W)
        if self.pieces is None:  # score-only
            return None, stats
        host = [np.asarray(p) for p in self.pieces]
        gf, tile = self.gf, self.tile

        def get_tb(k):
            g, t = divmod(k, tile)
            if g < gf:
                return host[0][g, :, t, :]
            return host[-1][0, :, t, :]

        return get_tb, stats


def fill_pallas_dev(
    S_tiled,
    n: np.ndarray,
    m: np.ndarray,
    *,
    mode: int,
    og: float,
    eg: float,
    score_only: bool = False,
    interpret: bool = False,
    masked_s: bool = False,
):
    """Dispatch the kernel only; returns DEVICE arrays (tb, stats) with no
    device->host copy."""
    G, NP, tile, MP = S_tiled.shape
    n = np.asarray(n)
    m = np.asarray(m)
    nt = jnp.asarray(n.reshape(G, tile, 1), jnp.int32)
    mt = jnp.asarray(m.reshape(G, tile, 1), jnp.int32)
    return pallas_dp.fill_tiled(
        S_tiled, nt, mt, mode=mode, og=float(og), eg=float(eg),
        score_only=score_only, interpret=interpret, masked_s=masked_s,
    )


@functools.partial(jax.jit, static_argnames=(
    "as_int8", "tile", "mode", "og", "eg", "score_only", "interpret",
    "masked",
))
def fill_from_codes(
    table, codes1, codes2, n, m, *, as_int8: bool, tile: int, mode: int,
    og: float, eg: float, score_only: bool = False,
    interpret: bool = False, masked: bool = False,
):
    """Score compute + kernel fill in ONE dispatched program.

    scores_tiled and fill_pallas_dev as separate jits cost two dispatch
    round trips per chunk; a large batch spends more wall time in
    per-call overhead than in compute (phase_probe 32x: score-only side
    ~0.3-0.4 s across 26 chunks).  ``masked`` poisons padded cells so the
    kernel runs its masked_s fast path (same flag to both stages).
    Returns DEVICE arrays (tb, stats)."""
    S = scores_tiled(
        table, codes1, codes2, as_int8=as_int8, tile=tile,
        n=n if masked else None, m=m if masked else None,
    )
    G = codes1.shape[0] // tile
    nt = n.reshape(G, tile, 1)
    mt = m.reshape(G, tile, 1)
    return pallas_dp.fill_tiled(
        S, nt, mt, mode=mode, og=float(og), eg=float(eg),
        score_only=score_only, interpret=interpret, masked_s=masked,
    )


@functools.partial(jax.jit, static_argnames=(
    "as_int8", "mode", "og", "eg", "interpret", "metas", "emit_runs",
))
def fill_many(table, flats, lens, *, as_int8: bool, mode: int, og: float,
              eg: float, interpret: bool, metas, emit_runs: bool = False):
    """Score compute + kernel fill for MANY bucket-chunks in ONE
    dispatched program — the fill-side analogue of
    ``device_walk.walk_bundle_pooled``.

    Tracing every chunk's score+fill into one jit collapses the
    per-bucket program executions to a single one; XLA runs the kernels
    back-to-back on device and frees each chunk's score tensor before
    the next kernel runs.

    Argument packing is transfer-count-aware: each chunk ships ONE flat
    codes buffer (``codes1.ravel() ++ codes2.ravel()``) and every
    chunk's lengths ride ONE shared array — per-chunk
    (codes1, codes2, n, m) uploads cost ~1.5 ms of tunnel round trip
    EACH, and a fine-ladder 100-pair suite call made ~244 of them
    (~0.4 s, more than all its device compute).

    Args:
      table: (K, K) f32 scoring table (shared by every chunk).
      flats: tuple of per-chunk 1-D int8/int32 code buffers,
             ``codes1.ravel() ++ codes2.ravel()``.
      lens:  (sum of 2*B over chunks,) int32: ``n_0 ++ m_0 ++ n_1 ++
             m_1 ++ ...`` in chunk order.
      metas: static tuple of per-chunk
             ``(B, NP, MP, tile, score_only, masked)``.

    Returns a tuple of per-chunk ``(tb, run, stats)`` DEVICE arrays (tb
    and run are None for score-only chunks; run is None unless
    ``emit_runs`` — the match-run bytes token walks consume,
    pallas_dp.fill_tiled(emit_runs=True)).  The program specializes on
    the ordered chunk-shape composition — callers must stage chunks in a
    canonical order (see BatchAligner._stage_fill) or every shuffled
    call of the same workload re-traces a multi-second program.
    """
    out = []
    off = 0
    for flat, (B, NP, MP, tile, score_only, masked) in zip(flats, metas):
        codes1 = flat[: B * NP].reshape(B, NP)
        codes2 = flat[B * NP:].reshape(B, MP)
        n = lens[off: off + B]
        m = lens[off + B: off + 2 * B]
        off += 2 * B
        S = scores_tiled(
            table, codes1, codes2, as_int8=as_int8, tile=tile,
            n=n if masked else None, m=m if masked else None,
        )
        G = B // tile
        r = pallas_dp.fill_tiled(
            S, n.reshape(G, tile, 1), m.reshape(G, tile, 1), mode=mode,
            og=float(og), eg=float(eg), score_only=score_only,
            interpret=interpret, masked_s=masked,
            emit_runs=emit_runs and not score_only,
        )
        out.append(r if len(r) == 3 else (r[0], None, r[1]))
    return tuple(out)


def fill_pallas_async(
    S_tiled,
    n: np.ndarray,
    m: np.ndarray,
    *,
    mode: int,
    og: float,
    eg: float,
    count: int,
    score_only: bool = False,
    interpret: bool = False,
    masked_s: bool = False,
) -> PendingFill:
    """Dispatch the kernel and the on-device transfer slicing WITHOUT
    forcing a device->host copy, so many buckets can be in flight at once
    (the 100-pair suite is latency/D2H-bound, not fill-bound: REFBENCH).

    Unlike ``fill_pallas``, the transfer plan also drops the PADDING PAIRS:
    only ``count`` real pairs come back — full tile groups wholesale, plus
    the used sublanes (rounded to 8) of a trailing partial group.
    """
    G, NP, tile, MP = S_tiled.shape
    n = np.asarray(n)
    m = np.asarray(m)
    tb, stats = fill_pallas_dev(
        S_tiled, n, m, mode=mode, og=og, eg=eg,
        score_only=score_only, interpret=interpret, masked_s=masked_s,
    )
    if tb is None:
        return PendingFill(None, stats, tile, count, G * tile)
    max_n = min(NP, -(-int(n[:count].max()) // 8) * 8)
    max_m = min(MP, -(-int(m[:count].max()) // 128) * 128)
    gf, rem = divmod(count, tile)
    pieces = []
    if gf:
        pieces.append(tb[:gf, :max_n, :, :max_m])
    if rem:
        rem8 = min(tile, -(-rem // 8) * 8)
        pieces.append(tb[gf:gf + 1, :max_n, :rem8, :max_m])
    return PendingFill(pieces, stats, tile, count, G * tile, gf=gf)


_scan_batch = jax.jit(
    jax.vmap(scan_dp.fill, in_axes=(0, 0, 0, None, None, None, None)),
    static_argnums=(5, 6),
)


def fill_scan(
    S_dense,
    n: np.ndarray,
    m: np.ndarray,
    *,
    mode: int,
    og: float,
    eg: float,
    score_only: bool = False,
):
    """vmapped lax.scan fallback; returns (FillResult-of-arrays)."""
    return _scan_batch(
        jnp.asarray(S_dense),
        jnp.asarray(n, jnp.int32),
        jnp.asarray(m, jnp.int32),
        jnp.float32(og),
        jnp.float32(eg),
        mode,
        not score_only,
    )


def tb_pair_view(tb_tiled: np.ndarray, pair_idx: int) -> np.ndarray:
    """(NP, MP) interior-pointer view of one pair from the tiled tb array."""
    tile = tb_tiled.shape[2]
    g, t = divmod(pair_idx, tile)
    return tb_tiled[g, :, t, :]
