"""One process of the 2-process jax.distributed CPU test
(tests/test_multihost.py).  Each process owns 4 virtual CPU devices;
the global (data=4, index=2) mesh spans both processes; each process
feeds only ITS local rows of the global batch (the host-batch contract
in monica_tpu/parallel/mesh.py: shard_reads) and both must agree on
the replicated global count vector.

Run: python multihost_worker.py <pid> <nproc> <coordinator> <outdir>
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
    jax.config.update("jax_num_cpu_devices", 4)

    from monica_tpu.parallel import dist

    dist.multihost_init(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc
    assert len(jax.local_devices()) == 4

    from __graft_entry__ import _reads_from, _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.parallel import mesh as pm

    n_index = 2
    built, seqs = _tiny_index(n_genomes=4, n_shards=n_index)
    stacked, steps = pl.stack_device_shards(built.shards)
    params = pl.ClassifyParams(n_slots=64, tag_bits=steps)
    n_data = len(jax.devices()) // n_index
    mesh = pm.make_mesh(n_data=n_data, n_index=n_index)

    # deterministic GLOBAL batch; this process feeds only its local rows
    g_codes, g_lengths = _reads_from(seqs, n_reads=4 * n_data, read_len=512)
    rows_per_proc = len(g_codes) // nproc
    lo = pid * rows_per_proc
    local_codes = g_codes[lo : lo + rows_per_proc]
    local_lengths = g_lengths[lo : lo + rows_per_proc]

    step = dist.make_sharded_classifier(
        mesh, params, built.meta.n_accessions, pl.MODE_BASIC
    )
    sidx = pm.shard_index(mesh, stacked)
    dcodes, dlens = pm.shard_reads(mesh, local_codes, local_lengths)
    result, counts = step(sidx, dcodes, dlens)
    # counts are PER DATA RANK (n_data, n_acc) sharded over data (so a
    # multi-host runtime can read its own hosts' counts locally); the
    # global table is the sum over ranks — allgather the local sums
    from jax.experimental import multihost_utils

    local = pm.fetch_local_rows(counts).sum(axis=0)
    counts = np.asarray(
        multihost_utils.process_allgather(local)
    ).reshape(nproc, -1).sum(axis=0)

    # golden: single-device classification of the SAME global batch
    import jax.numpy as jnp

    hits = []
    for sh in built.shards:
        dev, tb = pl.device_shard(sh)
        hits.append(
            pl.classify_shard(
                dev,
                jax.device_put(jnp.asarray(g_codes), jax.local_devices()[0]),
                jax.device_put(jnp.asarray(g_lengths), jax.local_devices()[0]),
                params._replace(tag_bits=tb),
            )
        )
    ref = pl.merge_hits(jax.tree.map(lambda *xs: jnp.stack(xs), *hits))
    golden = np.bincount(
        np.asarray(ref.acc_id)[np.asarray(ref.status) == pl.MAPPED],
        minlength=built.meta.n_accessions,
    )
    assert counts.sum() > 0, "no reads mapped"
    assert np.array_equal(counts, golden), (counts, golden)

    with open(os.path.join(outdir, f"ok_{pid}"), "w") as fh:
        fh.write(",".join(map(str, counts.tolist())))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
