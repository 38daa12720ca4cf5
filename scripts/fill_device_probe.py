#!/usr/bin/env python3
"""Isolate the DEVICE cost of the 32x suite's fills: one merged
fill_many program vs per-chunk fill_from_codes dispatches, measured as
dispatch->block_until_ready wall (min of N) in one process/window.

Also times the pooled walks given each arm's tb arrays, to see where the
fill_ab gap (pooled slower by ~0.2 s, /tmp/fill_ab_old.log) lives.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REF = "/root/reference"


def load_codes(sm):
    from smithwaterman_tpu.io.fasta import load_fasta

    pairs = []
    with open(f"{REF}/test/file_list.txt") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                a = load_fasta(f"{REF}/test/{parts[0]}")[0]
                b = load_fasta(f"{REF}/test/{parts[1]}")[0]
                pairs.append((sm.seq_to_index(a.seq), sm.seq_to_index(b.seq)))
    return pairs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=3)
    ap.add_argument("--scale", type=int, default=32)
    ap.add_argument("--ladder", default="old", choices=("old", "new"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from smithwaterman_tpu.batch_aligner import BatchAligner, _pow2_chunks
    from smithwaterman_tpu.config import LOCAL, AlignConfig, bucket_len
    from smithwaterman_tpu.matrices import SubstitutionMatrix
    from smithwaterman_tpu.ops import batch as batch_ops
    from smithwaterman_tpu.ops.pallas_dp import choose_tile

    OLD = (64, 128, 256, 512, 1024, 2048, 4096, 8192)
    cfg = AlignConfig(mode=LOCAL, buckets=OLD) if args.ladder == "old" \
        else AlignConfig(mode=LOCAL)
    sm = SubstitutionMatrix.blosum62()
    codes = load_codes(sm) * args.scale
    print(json.dumps({"backend": jax.default_backend(),
                      "pairs": len(codes), "ladder": args.ladder}),
          flush=True)

    # bucket + pack the way BatchAligner does (sorted shape order)
    buckets = {}
    for c1, c2 in codes:
        key = (bucket_len(len(c1), cfg.buckets),
               bucket_len(len(c2), cfg.buckets))
        buckets.setdefault(key, []).append((c1, c2))
    chunks = []   # (codes1, codes2, n, m) padded per chunk
    metas = []
    for (NP, MP) in sorted(buckets):
        grp = buckets[(NP, MP)]
        count = len(grp)
        tile = choose_tile(count, MP)
        B = -(-count // tile) * tile
        a = np.zeros((B, NP), np.int32)
        b = np.zeros((B, MP), np.int32)
        n = np.ones(B, np.int32)
        m = np.ones(B, np.int32)
        for k, (c1, c2) in enumerate(grp):
            a[k, :len(c1)] = c1
            b[k, :len(c2)] = c2
            n[k] = len(c1)
            m[k] = len(c2)
        g0 = 0
        for gc in _pow2_chunks(B // tile, cap=8):
            lo, hi = g0 * tile, (g0 + gc) * tile
            chunks.append((a[lo:hi], b[lo:hi], n[lo:hi], m[lo:hi]))
            metas.append((hi - lo, NP, MP, tile, False, True))
            g0 += gc
    print(json.dumps({"n_chunks": len(chunks)}), flush=True)

    table = jnp.asarray(np.asarray(sm.table, np.float32))
    tb_bytes = sum(c[0].shape[0] * c[0].shape[1] * c[1].shape[1]
                   for c in chunks)
    print(json.dumps({"tb_gb": round(tb_bytes / 1e9, 2)}), flush=True)

    # the tunnel caches identical (program, args) executions: perturb one
    # codes value per call (CLAUDE.md timing protocol) so every rep runs
    bump = [0]

    def _bumped():
        bump[0] += 1
        c1, c2, n, m = chunks[0]
        c1 = c1.copy()
        c1[0, 0] = bump[0] % 20
        return [(c1, c2, n, m)] + list(chunks[1:])

    def run_merged():
        ch = _bumped()
        flats = tuple(np.concatenate([c1.ravel(), c2.ravel()])
                      for c1, c2, n_, m_ in ch)
        lens = jnp.asarray(np.concatenate(
            [np.concatenate([n_, m_]) for c1, c2, n_, m_ in ch]), jnp.int32)
        t0 = time.time()
        outs = batch_ops.fill_many(
            table, flats, lens, as_int8=True, mode=LOCAL,
            og=-10.0, eg=-0.5, interpret=False, metas=tuple(metas))
        # ONE sync only: programs execute in dispatch order, so a VALUE
        # read of the last stats block proves everything ran (a block/
        # read per chunk would add ~25 ms of round trip per chunk).
        # fill_many returns (tb, run, stats) triples.
        _ = float(np.asarray(outs[-1][2])[0, 0, 0])
        return time.time() - t0

    def run_per_chunk():
        ch = _bumped()
        t0 = time.time()
        outs = []
        for (c1, c2, n, m), (B_, NP_, MP_, tile, so, mk) in zip(ch, metas):
            outs.append(batch_ops.fill_from_codes(
                table, c1, c2, jnp.asarray(n, jnp.int32),
                jnp.asarray(m, jnp.int32), as_int8=True, tile=tile,
                mode=LOCAL, og=-10.0, eg=-0.5, score_only=so,
                interpret=False, masked=mk))
        _ = float(np.asarray(outs[-1][1])[0, 0, 0])
        return time.time() - t0

    def run_upload():
        ch = _bumped()
        t0 = time.time()
        devs = [jax.device_put(c1) for (c1, c2, n, m) in ch]
        devs += [jax.device_put(c2) for (c1, c2, n, m) in ch]
        _ = int(np.asarray(devs[-1])[0, 0])
        return time.time() - t0

    for name, fn in (("merged", run_merged), ("per_chunk", run_per_chunk),
                     ("upload", run_upload)):
        cold = fn()
        print(json.dumps({"arm": name, "cold_s": round(cold, 3)}),
              flush=True)
    for name, fn in (("merged", run_merged), ("per_chunk", run_per_chunk),
                     ("upload", run_upload)):
        walls = [round(fn(), 4) for _ in range(args.rep)]
        print(json.dumps({"arm": name, "walls": walls,
                          "best_s": min(walls)}), flush=True)


if __name__ == "__main__":
    main()
