#!/usr/bin/env python
"""Stage + knob profiler for the classify pipeline (flushes each line).

Each timing runs the stage R times inside one lax.scan dispatch (the
tunnel adds ~25 ms/dispatch and block_until_ready does not sync — only
a host fetch does).  Prints ms/batch incrementally so partial output
survives a timeout.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

R = 8
GENOME_LEN = 1_000_000
N_GENOMES = 5
READ_LEN = 1024
BATCH = 2048


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.index import minimizer as mz
    from monica_tpu.ops import lookup as lk
    from monica_tpu.ops import chain as ch

    def scan_loop(stage):
        def fn():
            def body(c, _):
                out = stage()
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c + leaf.astype(jnp.float32).sum(), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
            return tot

        return jax.jit(fn)

    def timed(name, stage):
        fn = scan_loop(stage)
        np.asarray(fn())  # compile+sync
        t0 = time.time()
        np.asarray(fn())
        ms = (time.time() - t0) / R * 1000.0
        log(f"{name:28s}: {ms:8.2f} ms/batch  ({BATCH/ms*1000:,.0f} reads/s)")
        return ms

    t0 = time.time()
    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    dev, tb = pl.device_shard(built.shards[0])
    params = pl.ClassifyParams(n_slots=128, tag_bits=tb)
    log(f"build {time.time()-t0:.1f}s  rows={dev.mz_rows.shape} tag_bits={tb}")

    rng = np.random.default_rng(3)
    codes = np.stack(
        [
            seqs[rng.integers(0, N_GENOMES)][s : s + READ_LEN]
            for s in rng.integers(0, GENOME_LEN - READ_LEN, BATCH)
        ]
    ).astype(np.uint8)
    m = rng.random(codes.shape) < 0.05
    codes[m] = rng.integers(0, 4, int(m.sum()))
    lengths = np.full(BATCH, READ_LEN, np.int32)
    cd, ld = jnp.asarray(codes), jnp.asarray(lengths)

    timed("full (extend=True)", lambda: pl.classify_shard(dev, cd, ld, params))
    noext = params._replace(extend=False)
    timed("full (extend=False)", lambda: pl.classify_shard(dev, cd, ld, noext))
    timed("sketch_reads_jax", lambda: mz.sketch_reads_jax(cd, params.n_slots, params.k, params.w))

    qh, qp, qs, qv = jax.jit(
        lambda c: mz.sketch_reads_jax(c, params.n_slots, params.k, params.w)
    )(cd)
    qv = qv & (qp < (ld[:, None] - params.k + 1))
    qh, qp, qs, qv = jax.device_put((qh, qp, qs, qv))

    def lku():
        return lk.lookup_anchors(
            dev.mz_rows, qh, qp, qs, qv,
            tag_bits=params.tag_bits, bucket_len=READ_LEN,
        )

    timed("lookup_anchors (row-table)", lku)

    key, diag, rpos, fpos = jax.jit(lku)()
    key, diag, rpos, fpos = jax.device_put((key, diag, rpos, fpos))

    timed("chain_votes (run=128)", lambda: ch.chain_votes(key, diag, rpos, fpos))
    timed("chain_votes (run=32)", lambda: ch.chain_votes(key, diag, rpos, fpos, max_run=32))
    timed("  sort only", lambda: jnp.sort(key, axis=-1))

    skeys = jax.jit(lambda k: jnp.sort(k, axis=-1))(jnp.asarray(key))
    timed("  pair_votes only (128)", lambda: ch._pair_votes(skeys, 128))
    timed("  pair_votes only (32)", lambda: ch._pair_votes(skeys, 32))


if __name__ == "__main__":
    main()
