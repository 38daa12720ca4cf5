"""Long-sequence alignment: checkpointed fill + banded traceback re-fill.

The reference materializes full O(n*m) per-cell flags and reads them back
(opencl_sequence_alignment.rs:556-557,765-795), capping practical lengths at
its ~26k x 26k i32 limit and paying a full-matrix device->host transfer.
The TPU-native long-sequence path instead:

  1. ``fill_checkpointed`` — score-only fill that stores the (M, X, Y) carry
     rows every ``ckpt_rows`` rows: O(NP/ckpt_rows * MP) f32 on device, no
     pointer bytes at all.
  2. Walks the optimal path top-down in ``ckpt_rows``-row segments: each
     segment is re-filled from its checkpoint with ``fill_band`` (emitting
     pointer bytes for just that band), walked on host, and discarded.
     Re-fill replays the exact same cell rules, so tie-breaks — and
     therefore the path — are identical to the single-pass fill.

Total compute is ~2x the plain fill; device->host traffic drops from
O(n*m) to O(n*MP_band_transfers) and device memory for pointers from
O(n*m) to O(ckpt_rows*MP) per tile.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CELL_GAPINX, CELL_GAPINY, CELL_MATCH, CELL_STOP, GLOBAL, LOCAL
from . import pallas_dp
from .pallas_dp import STATS_W


def default_ckpt_rows(np_pad: int, mp_pad: int, tbp: int, itemsize: int) -> int:
    rb = pallas_dp._row_block(np_pad, mp_pad, tbp, itemsize)
    ck = rb
    while ck < 256 and ck * 2 <= np_pad:
        ck *= 2
    return ck


def row0_carries(
    B: int, mp: int, mode: int, og: float, eg: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Closed-form boundary-row carries (j = 1..mp), matching the kernel's
    un-seeded init (rs:100-108)."""
    so, se = (og, eg) if mode == GLOBAL else (0.0, 0.0)
    sent = 10.0 * og + 10.0 * eg
    jf1 = np.arange(1, mp + 1, dtype=np.float32)
    lsc = jf1 * se + (so - se)
    m0 = np.broadcast_to(lsc + sent, (B, mp)).astype(np.float32)
    x0 = np.broadcast_to(lsc, (B, mp)).astype(np.float32)
    y0 = np.broadcast_to(lsc + sent, (B, mp)).astype(np.float32)
    return m0.copy(), x0.copy(), y0.copy()


WALK_DONE = 0      # path complete
WALK_UP = 1        # walked off the top of the band
WALK_LEFT = 2      # walked off the left edge of the column window


def walk_band(
    tb_band: np.ndarray,  # (C, W) uint8 window for one pair
    i_top: int,           # global row of the row ABOVE the band (= sk*C)
    j_off: int,           # global column of the window's first stored column - 1
    i: int,
    j: int,
    s: int,
    local: bool,
) -> Tuple[List[int], List[int], int, int, int, int]:
    """Walk within one band window.  ``tb_band[r, c]`` holds DP cell
    (i_top + r + 1, j_off + c + 1).  Returns
    (idx1_chunk, idx2_chunk, i, j, s, status) with chunks in walk
    (reverse-path) order and global 0-based indices."""
    from .traceback import native_walk_band, normalize_boundary_state

    native = native_walk_band(tb_band, i_top, j_off, i, j, s, local)
    if native is not None:
        return native

    r1: List[int] = []
    r2: List[int] = []
    width = tb_band.shape[1]
    while True:
        s = normalize_boundary_state(i, j, s)
        # predecessor of the current cell (closed form on true boundaries,
        # cf. traceback._boundary_prev)
        if i == 0 and j == 0:
            prev = CELL_STOP if (local and s == CELL_MATCH) else CELL_MATCH
        elif i == 0:
            prev = CELL_STOP if (local and s == CELL_GAPINX) else CELL_GAPINX
        elif j == 0:
            prev = CELL_STOP if (local and s == CELL_GAPINY) else CELL_GAPINY
        else:
            c = j - 1 - j_off
            if c < 0 or c >= width:
                return r1, r2, i, j, s, WALK_LEFT
            prev = (int(tb_band[i - i_top - 1, c]) >> (2 * s)) & 3
        if local and prev == CELL_STOP:
            return r1, r2, i, j, s, WALK_DONE
        if s == CELL_MATCH:
            r1.append(i - 1)
            r2.append(j - 1)
            i -= 1
            j -= 1
        elif s == CELL_GAPINX:
            r1.append(-1)
            r2.append(j - 1)
            j -= 1
        elif s == CELL_GAPINY:
            r1.append(i - 1)
            r2.append(-1)
            i -= 1
        else:  # pragma: no cover
            raise RuntimeError(f"invalid state {s} at ({i},{j})")
        if i == 0 and j == 0:
            return r1, r2, i, j, s, WALK_DONE
        s = prev
        if 0 < i <= i_top and j > 0:
            # walked off the top of this band; continue in the one above
            return r1, r2, i, j, s, WALK_UP


@functools.partial(
    jax.jit,
    static_argnames=("mode", "og", "eg", "W", "C", "interpret"),
)
def _seg_fill_windows(
    S_tiled, nt, mt, ckm, ckx, cky, m0, x0, y0, sk, gs, ts, j0s,
    *, mode: int, og: float, eg: float, W: int, C: int, interpret: bool,
):
    """ONE device call per traceback segment: slice the segment's S band,
    select its seed carries (checkpoint ``sk - 1``, or the closed-form
    row-0 carries at ``sk == 0``), run the band re-fill kernel, and gather
    every active pair's (C, W) column window.  Fusing these used to be 6+
    separate dispatches per segment — at ~15-20 ms tunnel round-trip each,
    dispatch (not compute) dominated align_long wall time."""
    G, NP, tbp, MP = S_tiled.shape
    S_band = jax.lax.dynamic_slice(
        S_tiled, (0, sk * C, 0, 0), (G, C, tbp, MP)
    )
    idx = jnp.maximum(sk - 1, 0)

    def seed(ck, r0):
        s = jax.lax.dynamic_slice(ck, (0, idx, 0, 0), (G, 1, tbp, MP))
        return jnp.where(sk == 0, r0, s[:, 0])

    icm, icx, icy = seed(ckm, m0), seed(ckx, x0), seed(cky, y0)
    i0 = jnp.reshape(sk * C, (1, 1)).astype(jnp.int32)
    tb_band, _ = pallas_dp.fill_band(
        S_band, nt, mt, i0, icm, icx, icy,
        mode=mode, og=og, eg=eg, interpret=interpret,
    )

    def one(g, t, j0):
        sl = jax.lax.dynamic_slice(tb_band, (g, 0, t, j0), (1, C, 1, W))
        return sl[0, :, 0, :]

    return jax.vmap(one)(gs, ts, j0s)


def _pad_items(items):
    """Pad a list of equal-length index tuples to a power-of-two count so
    the number of compiled programs stays O(log B).  Returns one int32
    device vector per tuple position."""
    K = len(items)
    Kp = 1 << max(0, K - 1).bit_length() if K > 1 else 1
    width = len(items[0])
    cols = [np.zeros(Kp, np.int32) for _ in range(width)]
    for k, item in enumerate(items):
        for c, v in enumerate(item):
            cols[c][k] = v
    return tuple(jnp.asarray(c) for c in cols)


def align_long(
    S_tiled,               # (G, NP, TBP, MP) device array (int8/f32)
    n: np.ndarray,         # (B,)
    m: np.ndarray,
    *,
    mode: int,
    og: float,
    eg: float,
    ckpt_rows: Optional[int] = None,
    window: Optional[int] = None,
    interpret: bool = False,
):
    """Checkpoint-fill + banded-traceback alignment for one bucket.

    Returns (idx_lists, stats_np): idx_lists[k] = (idx1, idx2) aligned index
    lists (None entries for pairs needing no walk), stats_np (B, 8).
    """
    G, NP, tbp, MP = S_tiled.shape
    B = G * tbp
    C = ckpt_rows or default_ckpt_rows(NP, MP, tbp, S_tiled.dtype.itemsize)
    # column window: wide enough that a typical segment path fits (C rows
    # consume <= C columns plus gap runs); lane-aligned
    W = window or min(MP, -(-(2 * C + 128) // 128) * 128)
    W = min(W, MP)
    nt = jnp.asarray(np.asarray(n).reshape(G, tbp, 1), jnp.int32)
    mt = jnp.asarray(np.asarray(m).reshape(G, tbp, 1), jnp.int32)

    stats, (ckm, ckx, cky) = pallas_dp.fill_checkpointed(
        S_tiled, nt, mt, mode=mode, og=og, eg=eg, ckpt_rows=C,
        interpret=interpret,
    )
    stats_np = np.asarray(stats).reshape(B, STATS_W)

    # starting cell per pair
    cur: List[Optional[Tuple[int, int, int]]] = [None] * B
    chunks1: List[List[int]] = [[] for _ in range(B)]
    chunks2: List[List[int]] = [[] for _ in range(B)]
    for b in range(B):
        if mode == LOCAL:
            if stats_np[b, 0] > 0.0:
                cur[b] = (int(stats_np[b, 1]), int(stats_np[b, 2]), CELL_MATCH)
        else:
            fin = stats_np[b, 3:6]
            cur[b] = (int(n[b]), int(m[b]), int(np.argmax(fin)))

    local = mode == LOCAL
    m0_np, x0_np, y0_np = row0_carries(B, MP, mode, og, eg)
    m0d = jnp.asarray(m0_np.reshape(G, tbp, MP))
    x0d = jnp.asarray(x0_np.reshape(G, tbp, MP))
    y0d = jnp.asarray(y0_np.reshape(G, tbp, MP))
    n_segs = NP // C
    for sk in range(n_segs - 1, -1, -1):
        active = [
            b for b in range(B)
            if cur[b] is not None and sk * C < cur[b][0] <= (sk + 1) * C
        ]
        if not active:
            continue
        # ONE fused device call: band re-fill + every pending pair's
        # window gather (WALK_LEFT re-rounds re-fill too, but are rare:
        # only gap runs longer than the window need them)
        pend = [(b, *cur[b]) for b in active]
        while pend:
            items = []
            for b, i, j, s in pend:
                g, t = divmod(b, tbp)
                items.append((g, t, max(0, min(j - W, MP - W))))
            gs, ts, j0s = _pad_items(items)
            wins = np.asarray(_seg_fill_windows(
                S_tiled, nt, mt, ckm, ckx, cky, m0d, x0d, y0d,
                jnp.int32(sk), gs, ts, j0s,
                mode=mode, og=og, eg=eg, W=W, C=C, interpret=interpret,
            ))
            nxt = []
            for k, (b, i, j, s) in enumerate(pend):
                j0 = items[k][2]
                c1, c2, i, j, s, status = walk_band(
                    wins[k], sk * C, j0, i, j, s, local
                )
                chunks1[b].extend(c1)
                chunks2[b].extend(c2)
                if status == WALK_LEFT:
                    nxt.append((b, i, j, s))
                else:
                    cur[b] = None if status == WALK_DONE else (i, j, s)
            pend = nxt

    idx_lists = []
    for b in range(B):
        if cur[b] is not None:  # pragma: no cover - walk must terminate
            raise RuntimeError(f"incomplete traceback for pair {b}: {cur[b]}")
        idx_lists.append((chunks1[b][::-1], chunks2[b][::-1]))
    return idx_lists, stats_np
