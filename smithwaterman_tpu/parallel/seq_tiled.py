"""Sequence-tiled DP: one (giant) alignment striped across a device mesh.

The analogue of tensor/sequence parallelism for DP wavefronts (SURVEY.md
§2.5): the column axis of a single DP matrix is sharded over a ``('x',)``
mesh, and devices process row blocks in a software-pipelined wavefront —
device d computes row block r as soon as device d-1 has finished the same
rows.  The only cross-device traffic is each block's right-edge carry
(M, X, Y boundary values plus the max-plus prefix-scan running max C —
4 floats per row per pair), passed with ``lax.ppermute`` over ICI.

The prefix-scan composition is exact: with H[k] = G[k] - k*ge on *global*
column indices, cummax composes associatively across shards, so scores are
bit-identical to the single-device fill (tests/test_seq_tiled.py).

Score-only (the giant-pair use case is scoring + checkpointed traceback);
pure-JAX row math, so it runs on any backend — a Pallas per-shard row
kernel can be swapped in later.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import GLOBAL, GLOCAL, LOCAL

NEG = -3.0e38


@functools.partial(
    jax.jit,
    static_argnames=("mode", "og", "eg", "block_rows", "mesh"),
)
def striped_fill(S, n, m, *, mode, og, eg, block_rows, mesh):
    """Score a batch of pairs with the column axis sharded over ``mesh``.

    Args:
      S: (B, NP, MP) f32 dense substitution scores (sharded or shardable
         as P(None, None, 'x'); MP must divide by the mesh size).
      n, m: (B,) int32 true lengths.
      block_rows: wavefront granularity (rows per pipeline step).
    Returns:
      LOCAL: (B,) best scores.  GLOBAL/GLOCAL: (B, 3) final (M, X, Y) at
      (n, m) — same contract as the kernel's stats[3:6].
    """
    B, NP, MP = S.shape
    D = mesh.devices.size
    W = MP // D
    assert W * D == MP, (MP, D)
    K = block_rows
    NB = NP // K
    assert NB * K == NP, (NP, K)
    T = NB + D - 1
    ax = mesh.axis_names[0]
    if mode == GLOBAL:
        so, se = og, eg
    else:
        so, se = 0.0, 0.0
    sent = 10.0 * og + 10.0 * eg

    def local_fill(S_l, n_g, m_g):
        d = jax.lax.axis_index(ax)
        col0 = d * W                      # global column left of our lanes
        lane = jnp.arange(W, dtype=jnp.int32)
        jg = col0 + lane + 1              # global j of each local lane
        jgf = jg.astype(jnp.float32)
        nv = n_g.reshape(B, 1)
        mv = m_g.reshape(B, 1)
        is_dev0 = d == 0
        lane0_is_j1 = (jg == 1)[None, :]  # true only on device 0

        if mode == GLOCAL:
            last_col = jg[None, :] == mv
            qo = jnp.where(last_col, so, og)
            qe = jnp.where(last_col, se, eg)
        else:
            qo, qe = og, eg
        valid_j = jg[None, :] <= mv

        def lsc(fi):
            return fi * se + (so - se)

        # row-0 carries for local columns (closed form, rs:100-108)
        l0 = lsc(jgf)
        cm0 = jnp.broadcast_to(l0 + sent, (B, W))
        cx0 = jnp.broadcast_to(l0, (B, W))
        cy0 = jnp.broadcast_to(l0 + sent, (B, W))

        def dev0_edge(i):
            """Closed-form [M, X, Y, C] payload at the true j=0 boundary of
            row i (rs:109-117); C=NEG — H[0] is folded in inside row_math."""
            li = lsc(i.astype(jnp.float32))
            return jnp.broadcast_to(
                jnp.stack([li + sent, li + sent, li, jnp.float32(NEG)]),
                (B, 4),
            )

        def dev0_above(i):
            """Closed-form [M, X, Y] at (i, 0); (0,0) is the origin cell."""
            li = lsc(i.astype(jnp.float32))
            at0 = i == 0
            return jnp.broadcast_to(
                jnp.stack(
                    [
                        jnp.where(at0, 0.0, li + sent),
                        jnp.where(at0, -1.0, li + sent),
                        jnp.where(at0, -1.0, li),
                    ]
                ),
                (B, 3),
            )

        def row_math(i, srow, cm, cx, cy, eb, eb_above):
            """One DP row over the local lanes (cell rules of ops/scan_dp).

            eb: (B, 4) [M, X, Y, C] at (i, col0); C = running max of
                H[0..col0-1] (global domain).
            eb_above: (B, 3) [M, X, Y] at (i-1, col0).
            """
            fi = i.astype(jnp.float32)
            lsc_i = lsc(fi)

            Mp1 = jnp.concatenate([eb_above[:, 0:1], cm[:, :-1]], axis=1)
            Xp1 = jnp.concatenate([eb_above[:, 1:2], cx[:, :-1]], axis=1)
            Yp1 = jnp.concatenate([eb_above[:, 2:3], cy[:, :-1]], axis=1)
            val_m = jnp.maximum(jnp.maximum(Mp1, Xp1), Yp1) + srow

            if mode == LOCAL:
                val_y = jnp.maximum(jnp.maximum(cm, cx) + og, cy + eg)
                val_m = jnp.maximum(val_m, 0.0)
                val_y = jnp.maximum(val_y, 0.0)
            else:
                val_y = jnp.maximum(jnp.maximum(cm + qo, cy + qe), cx + qo)

            if mode == GLOCAL:
                lr = (i == n_g).reshape(B, 1)
                po = jnp.where(lr, so, og)
                pe = jnp.where(lr, se, eg)
            else:
                po, pe = og, eg

            # X via the global-domain prefix scan: H[k] = G[k] - k*pe
            g_edge = jnp.maximum(eb[:, 0:1], eb[:, 2:3]) + po  # G at col0
            gline = jnp.maximum(val_m, val_y) + po
            hraw = jnp.concatenate([g_edge, gline[:, :-1]], axis=1)
            h = hraw - (jgf - 1.0)[None, :] * pe
            # device 0 lane 0 holds H[0] = max(G[0], x0b + pe) (scan_dp:170)
            x0b = lsc_i + sent
            h = jnp.where(lane0_is_j1, jnp.maximum(h, x0b + pe), h)
            c = jnp.maximum(jax.lax.cummax(h, axis=1), eb[:, 3:4])
            val_x = c + (jgf - 1.0)[None, :] * pe
            if mode == LOCAL:
                val_x = jnp.maximum(val_x, 0.0)

            edge = jnp.stack(
                [val_m[:, -1], val_x[:, -1], val_y[:, -1], c[:, -1]], axis=1
            )
            return val_m, val_x, val_y, edge

        def step(carry, t):
            cm, cx, cy, inbox, above, runbest, acc = carry
            r = t - d
            active = (r >= 0) & (r < NB)
            r_c = jnp.clip(r, 0, NB - 1)
            Sblk = jax.lax.dynamic_slice(S_l, (0, r_c * K, 0), (B, K, W))

            def row_body(rc, q):
                cm, cx, cy, outbox, above_row, rb, a3 = rc
                i = r_c * K + q + 1
                eb = jnp.where(is_dev0, dev0_edge(i), inbox[:, q, :])
                eb_above = jnp.where(is_dev0, dev0_above(i - 1), above_row)
                vm, vx, vy, edge = row_math(
                    i, Sblk[:, q, :], cm, cx, cy, eb, eb_above
                )
                outbox = outbox.at[:, q, :].set(edge)
                if mode == LOCAL:
                    mask = valid_j & (i <= nv)
                    rb = jnp.maximum(
                        rb, jnp.max(jnp.where(mask, vm, NEG), axis=1)
                    )
                else:
                    take = (i == nv) & (jg[None, :] == mv)
                    a3 = a3 + jnp.stack(
                        [
                            jnp.sum(jnp.where(take, vm, 0.0), axis=1),
                            jnp.sum(jnp.where(take, vx, 0.0), axis=1),
                            jnp.sum(jnp.where(take, vy, 0.0), axis=1),
                        ],
                        axis=1,
                    )
                next_above = jnp.where(is_dev0, dev0_above(i), inbox[:, q, :3])
                return (vm, vx, vy, outbox, next_above, rb, a3), None

            outbox0 = jnp.zeros((B, K, 4), jnp.float32)
            (cm2, cx2, cy2, outbox, _, rb2, a32), _ = jax.lax.scan(
                row_body,
                (cm, cx, cy, outbox0, above, runbest, acc),
                jnp.arange(K),
            )

            cm = jnp.where(active, cm2, cm)
            cx = jnp.where(active, cx2, cx)
            cy = jnp.where(active, cy2, cy)
            runbest = jnp.where(active, rb2, runbest)
            acc = jnp.where(active, a32, acc)
            above = jnp.where(active, inbox[:, K - 1, :3], above)
            outbox = jnp.where(active, outbox, jnp.zeros_like(outbox))
            inbox = jax.lax.ppermute(
                outbox, ax, [(a, (a + 1) % D) for a in range(D)]
            )
            return (cm, cx, cy, inbox, above, runbest, acc), None

        # initial diag edge: row-0 values at column col0
        l0c = lsc(col0.astype(jnp.float32))
        # row 0 at column col0: origin cell for device 0, else the row-0
        # closed form (M = lsc+sent, X = lsc, Y = lsc+sent)
        above0 = jnp.broadcast_to(
            jnp.where(
                is_dev0,
                jnp.stack([jnp.float32(0.0), jnp.float32(-1.0), jnp.float32(-1.0)]),
                jnp.stack([l0c + sent, l0c, l0c + sent]),
            ),
            (B, 3),
        )
        carry0 = (
            cm0,
            cx0,
            cy0,
            jnp.zeros((B, K, 4), jnp.float32),
            above0,
            jnp.full((B,), NEG, jnp.float32),
            jnp.zeros((B, 3), jnp.float32),
        )
        carry, _ = jax.lax.scan(step, carry0, jnp.arange(T))
        _, _, _, _, _, runbest, acc = carry

        if mode == LOCAL:
            return jax.lax.pmax(runbest, ax)
        return jax.lax.psum(acc, ax)

    out_spec = P() if mode == LOCAL else P()
    return jax.shard_map(
        local_fill,
        mesh=mesh,
        in_specs=(P(None, None, ax), P(None), P(None)),
        out_specs=out_spec,
        check_vma=False,
    )(S, n, m)
