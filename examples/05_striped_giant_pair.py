"""One giant pair striped across every chip in the mesh: the column axis is
sharded, devices pipeline row blocks over ICI, and the full alignment string
comes back bit-identical to the single-device engine (parallel/seq_tiled).

Run with SWT_DEMO_DEVICES=8 to see the mesh path on 8 virtual CPU devices
(NB: this environment's sitecustomize clobbers XLA_FLAGS, so the flag must
be set in-process before the first backend use — see tests/conftest.py).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_nd = os.environ.get("SWT_DEMO_DEVICES")
if _nd:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_nd}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import smithwaterman_tpu as swt
from smithwaterman_tpu.aligner import reconstruct_alignment
from smithwaterman_tpu.matrices import SubstitutionMatrix
from smithwaterman_tpu.parallel import make_mesh
from smithwaterman_tpu.parallel.seq_tiled import striped_align

mesh = make_mesh()  # every visible device
D = mesh.devices.size
rng = np.random.default_rng(0)
letters = np.array(list("ARNDCQEGHILKMFPSTWYV"))

n, MP = 192, max(64 * D, 256)  # tiny demo shapes; scale up on real chips
codes1 = rng.integers(0, 20, size=n).astype(np.int32)
codes2 = np.concatenate([codes1[10:], rng.integers(0, 20, size=MP - n + 10)])
codes2 = codes2[:MP].astype(np.int32)
s1 = "".join(letters[codes1])
s2 = "".join(letters[codes2])

sm = SubstitutionMatrix.blosum62()
S = sm.dense_scores(codes1, codes2)[None].astype(np.float32)

idx_lists, stats = striped_align(
    S, np.array([n]), np.array([MP]), mode=swt.LOCAL, og=-10.0, eg=-0.5,
    mesh=mesh, block_rows=8, ckpt_rows=32,
)
r = reconstruct_alignment(
    s1, s2, idx_lists[0][0], idx_lists[0][1], float(stats[0, 0]), True,
    swt.LOCAL,
)
print(f"{D}-device striped alignment, score {r.score}")
print(r.aligned1[:80])
print(r.aligned2[:80])

# cross-check vs the plain single-device engine
want = swt.Aligner(mode=swt.LOCAL).align(s1, s2, True)
assert (r.aligned1, r.aligned2, r.score) == (
    want.aligned1, want.aligned2, want.score
)
print("matches the single-device engine exactly")
