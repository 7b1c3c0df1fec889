"""One process of the 2-process schedule-overflow test: when ANY host's
sample needs more device batches than the allgathered plan holds, EVERY
process must raise the same error AFTER the collective — not leave its
peers hung in the allgather (ADVICE r4 item 2).

Process 0 builds an oversized batch list (more than the patched slot
capacity); process 1 a normal one.  Both must exit with the marker
written AFTER catching ValueError.

Run: python multihost_overflow_worker.py <pid> <nproc> <coordinator> <outdir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pid, nproc, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )

    from monica_tpu.align import runtime as rt
    from monica_tpu.io import encode as enc

    rt._MAX_SCHED_SLOTS = 4  # tiny plan capacity for the test

    def batch():
        return enc.ReadBatch(
            np.zeros((2, 256), np.uint8),
            np.zeros(2, np.int32),
            np.arange(2, dtype=np.int32),
        )

    n = 6 if pid == 0 else 1  # only process 0 overflows
    try:
        rt._sync_batch_schedule([batch() for _ in range(n)])
    except ValueError as e:
        assert "max_batch" in str(e), e
        with open(os.path.join(outdir, f"raised_{pid}"), "w") as fh:
            fh.write(str(e))
        return
    raise SystemExit(f"process {pid}: expected ValueError, got none")


if __name__ == "__main__":
    main()
