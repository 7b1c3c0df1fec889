"""One process of the 2-process PRODUCT-PATH multihost test
(tests/test_multihost.py): drives rt.Classifier + rt.run_once — not the
raw sharded step — under jax.distributed (VERDICT r3 item 1).

Each process owns 4 virtual CPU devices; the global (data=4, index=2)
mesh spans both; the index has 3 shards (> index ranks: the grouped
rank-major stacking path).  The hosts have DIFFERENT sample files and
different sample counts (process 0: two samples, process 1: one), so
the run exercises the lockstep fillers and the batch-schedule
agreement.  Each host's per-sample count tables and routed FASTQs must
equal a single-device golden run of the same files.

Run: python multihost_product_worker.py <pid> <nproc> <coordinator> <outdir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sample_reads(seqs, n_reads, seed):
    """Deterministic variable-length reads (mixed buckets)."""
    from monica_tpu.io.encode import decode_seq

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_reads):
        g = seqs[rng.integers(0, len(seqs))]
        L = int(rng.integers(300, 900))
        start = int(rng.integers(0, len(g) - L + 1))
        out.append(decode_seq(g[start : start + L]))
    return out


def _write_fastq(path, reads):
    with open(path, "w") as fh:
        for i, s in enumerate(reads):
            fh.write(f"@read{i}\n{s}\n+\n{'I' * len(s)}\n")


# (sample name, n_reads, seed) per process
SAMPLES = {
    0: [("alpha", 12, 100), ("beta", 7, 101)],
    1: [("gamma", 9, 102)],
}


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

    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.align import runtime as rt
    from monica_tpu.parallel import mesh as pm
    from monica_tpu.stats.abundance import AbundanceState

    built, seqs = _tiny_index(n_genomes=4, n_shards=3)
    assert len(built.shards) == 3
    mesh = pm.make_mesh(n_data=4, n_index=2)
    params = pl.ClassifyParams(n_slots=64)
    clf = rt.Classifier(built, params, count_mode="basic", mesh=mesh)

    q = os.path.join(outdir, f"q{pid}")
    out = os.path.join(outdir, f"o{pid}")
    os.makedirs(q, exist_ok=True)
    my_samples = SAMPLES[pid]
    for name, n, seed in my_samples:
        _write_fastq(os.path.join(q, f"{name}.fastq"), _sample_reads(seqs, n, seed))

    reports = rt.run_once(clf, q, out)
    assert {r.sample for r in reports} == {s[0] for s in my_samples}
    state = AbundanceState.load(out, built.meta.n_accessions)

    # golden: single-device (non-mesh) product run over the same files
    gclf = rt.Classifier(built, params, count_mode="basic")
    qg = os.path.join(outdir, f"qg{pid}")
    og = os.path.join(outdir, f"og{pid}")
    os.makedirs(qg, exist_ok=True)
    for name, n, seed in my_samples:
        _write_fastq(os.path.join(qg, f"{name}.fastq"), _sample_reads(seqs, n, seed))
    greports = rt.run_once(gclf, qg, og)
    gstate = AbundanceState.load(og, built.meta.n_accessions)

    for name, _, _ in my_samples:
        assert np.array_equal(state.samples[name], gstate.samples[name]), (
            name, state.samples[name], gstate.samples[name]
        )
        assert gstate.samples[name].sum() > 0, f"{name}: golden mapped nothing"
        mesh_mapped = open(os.path.join(q, "mapped", f"{name}.fastq"), "rb").read()
        gold_mapped = open(os.path.join(qg, "mapped", f"{name}.fastq"), "rb").read()
        assert mesh_mapped == gold_mapped, f"{name}: routed mapped reads differ"

    with open(os.path.join(outdir, f"ok_{pid}"), "w") as fh:
        fh.write(
            ";".join(
                f"{n}:" + ",".join(map(str, state.samples[n].tolist()))
                for n, _, _ in my_samples
            )
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
