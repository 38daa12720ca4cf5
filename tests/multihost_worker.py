"""Worker process for the 2-process localhost jax.distributed test
(tests/test_multihost.py).  Not collected by pytest (no test_ prefix).

argv: <coordinator_port> <process_id> <out_dir>
"""

import os
import sys

PORT, PID, OUT_DIR = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from smithwaterman_tpu import BatchAligner, LOCAL, SeqData  # noqa: E402
from smithwaterman_tpu.parallel import multihost  # noqa: E402
from smithwaterman_tpu.sweep import SweepConfig, sweep  # noqa: E402


def main():
    multihost.initialize(f"localhost:{PORT}", num_processes=2, process_id=PID)
    assert multihost.process_count() == 2, multihost.process_count()
    assert multihost.process_index() == PID, multihost.process_index()
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8, jax.device_count()

    # DCN collective across the two processes
    from jax.experimental import multihost_utils

    ids = multihost_utils.process_allgather(np.array([PID], np.int32))
    assert sorted(np.asarray(ids).ravel().tolist()) == [0, 1], ids

    # host-sharded sweep: each process computes its chunk shard
    seqs = [
        SeqData(f"s{i}", "", s)
        for i, s in enumerate(
            ["HEAGAWGHEE", "PAWHEAE", "HEAGAWGHEF", "WWWPPP", "AWHEA", "GGGGG"]
        )
    ]
    engine = BatchAligner(mode=LOCAL, backend="scan")
    cfg = SweepConfig(
        chunk_pairs=2,
        process_index=multihost.process_index(),
        process_count=multihost.process_count(),
    )
    out = os.path.join(OUT_DIR, f"shard{PID}.jsonl")
    n = sweep(seqs, None, engine, out, cfg)
    print(f"WORKER {PID} OK chunks={n}", flush=True)


if __name__ == "__main__":
    main()
