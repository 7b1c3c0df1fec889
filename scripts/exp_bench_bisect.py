#!/usr/bin/env python
"""Bisect the bench regression: dev-as-argument vs closure, count_reads."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

GENOME_LEN = 1_000_000
N_GENOMES = 5
READ_LEN = 1024
BATCH = 2048
N_BATCHES = 8


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl

    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    dev = pl.device_shard(built.shards[0])
    rng = np.random.default_rng(3)
    codes = np.stack(
        [
            seqs[rng.integers(0, N_GENOMES)][s : s + READ_LEN]
            for s in rng.integers(0, GENOME_LEN - READ_LEN, BATCH * N_BATCHES)
        ]
    ).astype(np.uint8)
    m = rng.random(codes.shape) < 0.05
    codes[m] = rng.integers(0, 4, int(m.sum()))
    codes = codes.reshape(N_BATCHES, BATCH, READ_LEN)
    lengths = np.full((N_BATCHES, BATCH), READ_LEN, np.int32)
    params = pl.ClassifyParams(n_slots=128)
    n_acc = built.meta.n_accessions
    cd, ld = jnp.asarray(codes), jnp.asarray(lengths)

    def timed(name, f, *args):
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        print(f"{name:36s}: {(time.time()-t0)*1000:9.1f} ms total")

    # 1: bench-identical (dev as arg, scan, finalize+count)
    @jax.jit
    def v1(dev, codes, lengths):
        def body(carry, batch):
            c, l = batch
            hit = pl.classify_shard(dev, c, l, params)
            res = pl.finalize_single(hit)
            counts = pl.count_reads(res, l, n_acc, pl.MODE_QUERY_LENGTH)
            return carry + counts, res.status
        return jax.lax.scan(body, jnp.zeros(n_acc, jnp.int32), (codes, lengths))

    timed("v1 bench-identical", v1, dev, cd, ld)

    # 2: dev closed over (constant), same body
    @jax.jit
    def v2(codes, lengths):
        def body(carry, batch):
            c, l = batch
            hit = pl.classify_shard(dev, c, l, params)
            res = pl.finalize_single(hit)
            counts = pl.count_reads(res, l, n_acc, pl.MODE_QUERY_LENGTH)
            return carry + counts, res.status
        return jax.lax.scan(body, jnp.zeros(n_acc, jnp.int32), (codes, lengths))

    timed("v2 dev as closure constant", v2, cd, ld)

    # 3: dev as arg, no count_reads
    @jax.jit
    def v3(dev, codes, lengths):
        def body(carry, batch):
            c, l = batch
            hit = pl.classify_shard(dev, c, l, params)
            res = pl.finalize_single(hit)
            return carry + res.status.sum(), res.status
        return jax.lax.scan(body, jnp.zeros((), jnp.int32), (codes, lengths))

    timed("v3 dev as arg, no counts", v3, dev, cd, ld)


if __name__ == "__main__":
    main()
