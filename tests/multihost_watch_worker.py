"""One process of the 2-process multihost WATCH test: the real-time
loop under jax.distributed.  Each host's feeder drops a second flowcell
file while watch() is already polling; the synchronized idle counter
(runtime.watch) must let BOTH hosts exit together after the feed goes
quiet — without the sync one host would leave the other hung on a
collective.

Run: python multihost_watch_worker.py <pid> <nproc> <coordinator> <outdir>
"""

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    pid, nproc, coord, outdir = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from monica_tpu.parallel import dist

    dist.multihost_init(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )

    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.align import runtime as rt
    from monica_tpu.parallel import mesh as pm
    from monica_tpu.stats.abundance import AbundanceState
    from tests.multihost_product_worker import _sample_reads, _write_fastq

    built, seqs = _tiny_index(n_genomes=4, n_shards=2)
    mesh = pm.make_mesh(n_data=4, n_index=2)
    clf = rt.Classifier(
        built, pl.ClassifyParams(n_slots=64), count_mode="basic", mesh=mesh
    )

    q = os.path.join(outdir, f"q{pid}")
    out = os.path.join(outdir, f"o{pid}")
    os.makedirs(q, exist_ok=True)

    def drop(name: str, n: int, seed: int):
        tmp = os.path.join(outdir, f".{pid}_{name}.tmp")
        _write_fastq(tmp, _sample_reads(seqs, n, seed))
        os.replace(tmp, os.path.join(q, f"{name}.fastq"))  # atomic

    # batch 1 pre-dropped; batch 2 lands while watch() is polling.
    # host 1 feeds NOTHING in batch 2 — its idle exit must still wait
    # for host 0's second batch (the synchronized counter under test).
    drop(f"h{pid}b1", 10 + 4 * pid, 200 + pid)
    if pid == 0:
        feeder = threading.Timer(1.0, drop, args=(f"h{pid}b2", 8, 300))
        feeder.start()

    reports = rt.watch(clf, q, out, poll_s=0.3, max_idle_polls=8)
    expected = {f"h{pid}b1"} | ({f"h{pid}b2"} if pid == 0 else set())
    assert {r.sample for r in reports} == expected, reports

    state = AbundanceState.load(out, built.meta.n_accessions)
    assert set(state.samples) == expected
    assert all(v.sum() > 0 for v in state.samples.values())

    with open(os.path.join(outdir, f"watch_ok_{pid}"), "w") as fh:
        fh.write(",".join(sorted(state.samples)))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
