#!/usr/bin/env python
"""Headline benchmark: classification reads/s on one chip.

Workload mirrors BASELINE.json config 1: a mock community of 5
bacterial-sized genome subsets, replicated index, 1 kb nanopore-like
reads (5% substitutions).  The reference pipeline (mappy/minimap2
map-ont, 3 threads, `monica/monica.py:92-94`) sustains ~2,000 reads/s
at this read length on a workstation CPU — used as the fixed baseline
denominator since the reference publishes no numbers (BASELINE.md) and
mappy is not installable here.

Methodology notes (this environment):
* the device is reached through a tunnel where `block_until_ready` does
  NOT synchronize — only a host fetch does, so timing always ends with
  np.asarray();
* per-dispatch overhead is ~25 ms, so the classify loop runs on-device
  via lax.scan over resident batches (one dispatch), which is also how
  the streaming runtime amortizes dispatch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

BASELINE_READS_PER_S = 2000.0

GENOME_LEN = 1_000_000
N_GENOMES = 5
READ_LEN = 1024
BATCH = 2048
N_BATCHES = 8
SUB_RATE = 0.05


def main():
    from monica_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl

    t0 = time.time()
    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    dev, steps = pl.device_shard(built.shards[0])
    build_s = time.time() - t0

    rng = np.random.default_rng(3)
    codes = np.stack(
        [
            seqs[rng.integers(0, N_GENOMES)][s : s + READ_LEN]
            for s in rng.integers(0, GENOME_LEN - READ_LEN, BATCH * N_BATCHES)
        ]
    ).astype(np.uint8)
    m = rng.random(codes.shape) < SUB_RATE
    codes[m] = rng.integers(0, 4, int(m.sum()))
    codes = codes.reshape(N_BATCHES, BATCH, READ_LEN)
    lengths = np.full((N_BATCHES, BATCH), READ_LEN, np.int32)

    params = pl.ClassifyParams(n_slots=128, tag_bits=steps)
    n_acc = built.meta.n_accessions

    @jax.jit
    def run_all(dev, codes, lengths):
        def body(carry, batch):
            c, l = batch
            hit = pl.classify_shard(dev, c, l, params)
            res = pl.finalize_single(hit)
            counts = pl.count_reads(res, l, n_acc, pl.MODE_QUERY_LENGTH)
            return carry + counts, res.status

        return jax.lax.scan(body, jnp.zeros(n_acc, jnp.int32), (codes, lengths))

    cd, ld = jnp.asarray(codes), jnp.asarray(lengths)
    total, statuses = run_all(dev, cd, ld)
    np.asarray(total)  # compile + real sync (host fetch)

    t0 = time.time()
    total, statuses = run_all(dev, cd, ld)
    statuses_h = np.asarray(statuses)  # fetch forces completion
    dt = time.time() - t0

    n = BATCH * N_BATCHES
    reads_per_s = n / dt
    mapped = float((statuses_h == pl.MAPPED).mean())
    sys.stderr.write(
        f"[bench] build={build_s:.1f}s classify={dt:.3f}s "
        f"mapped_frac={mapped:.3f} device={jax.devices()[0].device_kind}\n"
    )
    print(
        json.dumps(
            {
                "metric": "classification_reads_per_s_per_chip",
                "value": round(reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
