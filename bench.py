#!/usr/bin/env python3
"""Benchmark: DP cell-updates/s of the batched Pallas fill kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against the driver-set north-star target of 100 GCUPS/chip (BASELINE.json).

Timing is honest: iterations are chained through a data dependency so the
async dispatch (and the axon tunnel's execution caching) cannot hide real
device time.  Workload: 512 pairs of 512x512 protein DP with full traceback
output, BLOSUM62, go=10/ge=0.5 — the reference suite's median-length regime.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def measure(tile, B, NP, MP, ncall, on_tpu):
    """Best-of-3 chained GCUPS for one workload shape (full traceback)."""
    from smithwaterman_tpu.config import LOCAL
    from smithwaterman_tpu.matrices import SubstitutionMatrix
    from smithwaterman_tpu.ops import batch, pallas_dp

    sm = SubstitutionMatrix.blosum62()
    rng = np.random.default_rng(0)
    codes1 = rng.integers(0, 20, size=(B, NP)).astype(np.int32)
    codes2 = rng.integers(0, 20, size=(B, MP)).astype(np.int32)
    # production LOCAL path: padded cells of S poisoned so the kernel runs
    # its unmasked running-best fast path (batch_aligner._fill_pallas)
    lens1 = jnp.full(B, NP, jnp.int32)
    lens2 = jnp.full(B, MP, jnp.int32)
    S0 = batch.scores_tiled(
        jnp.asarray(sm.table), codes1, codes2, as_int8=True, tile=tile,
        n=lens1, m=lens2,
    )
    G = B // tile
    nt = jnp.full((G, tile, 1), NP, jnp.int32)
    mt = jnp.full((G, tile, 1), MP, jnp.int32)

    @jax.jit
    def chain(S, nt0):
        def body(nmt, _):
            nt_c, mt_c = nmt
            tb, stats = pallas_dp.fill_tiled(
                S, nt_c, mt_c, mode=LOCAL, og=-10.0, eg=-0.5,
                interpret=not on_tpu, masked_s=True,
            )
            # serialize through the tiny length arrays: next iteration
            # depends on this one's output without copying S
            bump = (stats[0, 0, 0] * 0.0).astype(jnp.int32)
            return (nt_c + bump, mt_c + bump), stats[0, 0, 0]
        _, scores = jax.lax.scan(body, (nt0, mt), None, length=ncall)
        return scores

    # timing robustness on the axon tunnel: (a) read a VALUE back per
    # measurement (block_until_ready can return early), (b) feed a fresh
    # nt buffer per call (identical (program, args) executions are cached)
    r = chain(S0, nt)
    float(np.asarray(r)[-1])  # compile + warm
    dt = None
    for _ in range(3):  # best of 3 chains (tunnel dispatch jitter)
        nt_k = jnp.asarray(np.asarray(nt))  # fresh device buffer
        t0 = time.time()
        r = chain(S0, nt_k)
        float(np.asarray(r)[-1])
        d = (time.time() - t0) / ncall
        dt = d if dt is None else min(dt, d)
    return B * NP * MP / dt / 1e9, dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        tile, B, NP, MP, ncall = 128, 512, 512, 512, 32
    else:  # CPU smoke: tiny interpret-mode run so the script always works
        tile, B, NP, MP, ncall = 8, 8, 128, 128, 1

    gcups, dt = measure(tile, B, NP, MP, ncall, on_tpu)
    # peak-regime context (same kernel, the widest-row workload from
    # BENCH_SUITE): measured fresh here, not quoted from an artifact
    peak = None
    if on_tpu:
        try:
            peak, _ = measure(32, 32, 4096, 4096, 16, on_tpu)
        except Exception as e:  # context only — never break the headline
            print(f"# peak-config measurement failed: {e}", file=sys.stderr)

    # hardware-health context (stdout stays one JSON line; the probe value
    # also rides the row as window context, VERDICT r4 weak #8): the axon
    # worker intermittently degrades to single-digit-GB/s HBM streaming
    # (2026-08-18 window, MEASUREMENTS_r02.md) which craters every
    # HBM-bound number ~30x; record effective bandwidth so a degraded-window
    # result is distinguishable from a kernel regression.
    gbs = None
    if on_tpu:
        from smithwaterman_tpu.utils.metrics import hbm_stream_probe

        gbs = hbm_stream_probe()
        if gbs is None:
            print("# hbm probe failed or unavailable (window context "
                  "missing — treat auxiliary numbers with care)",
                  file=sys.stderr)
        if gbs is not None:
            print(f"# hbm_stream_gbs={gbs:.0f} (healthy v5e ~800)",
                  file=sys.stderr)
            if gbs < 300:
                print(
                    "# NOTE: XLA-streaming HBM probe is slow in this window;"
                    " HBM-bound *auxiliary* numbers may be affected.  The"
                    " fill kernel itself is issue-bound, not HBM-bound"
                    " (MEASUREMENTS_r02.md: f32 S at 4x bytes is the same"
                    " speed; Pallas runs at full speed while XLA streaming"
                    " is slow), so the GCUPS figure below is NOT understated.",
                    file=sys.stderr,
                )

    row = {
        "metric": "dp_cell_updates_per_chip",
        "value": round(gcups, 2),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / 100.0, 3),
        "workload": f"{B}x{NP}x{MP} local traceback",
        # window context: best-of-3 chained reps; streaming-bandwidth
        # probe distinguishes a degraded measurement window from a
        # kernel regression (healthy v5e ~800)
        "window": {"hbm_stream_gbs": gbs, "reps": 3},
    }
    if peak is not None:
        # same kernel at its widest-row regime (32 pairs of 4096^2): the
        # headline workload is scan-amortization-bound at mp=512
        # (MEASUREMENTS_r03.md), not the kernel ceiling
        row["peak_gcups_tb"] = round(peak, 2)
        row["peak_workload"] = "32x4096x4096 local traceback"
    print(json.dumps(row))


if __name__ == "__main__":
    main()
