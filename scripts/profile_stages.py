#!/usr/bin/env python
"""Per-stage timing of the classify pipeline on the real device.

Each stage runs R times inside one lax.scan dispatch (the tunnel adds
~25 ms per dispatch, so stages must be amortized on-device).  Prints
ms/batch per stage.
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


def timed(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile+sync
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / R * 1000.0


def scan_loop(stage):
    """Run `stage` R times in one dispatch, threading a dummy carry."""
    import jax
    import jax.numpy as jnp

    def fn(*args):
        def body(c, _):
            out = stage(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.astype(jnp.float32).sum(), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
        return tot

    return jax.jit(fn)


def main():
    global jax
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.index import minimizer as mz
    from monica_tpu.ops import lookup as lk
    from monica_tpu.ops import chain as ch

    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    dev, steps = pl.device_shard(built.shards[0])
    params = pl.ClassifyParams(n_slots=128, lookup_steps=steps)
    print(f"table M={dev.mz_hash.shape} steps={steps}", file=sys.stderr)

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

    # full pipeline
    full = scan_loop(lambda: pl.classify_shard(dev, cd, ld, params))
    print(f"full classify_shard : {timed(full):8.2f} ms/batch")

    # stage 1: sketch
    sk = scan_loop(lambda: mz.sketch_reads_jax(cd, params.n_slots, params.k, params.w))
    print(f"sketch_reads_jax    : {timed(sk):8.2f} ms/batch")

    qh, qp, qs, qv = jax.jit(
        lambda c: mz.sketch_reads_jax(c, params.n_slots, params.k, params.w)
    )(cd)
    qv = qv & (qp < (ld[:, None] - params.k + 1))
    qh, qp, qs, qv = map(jnp.asarray, (qh, qp, qs, qv))

    # stage 2: lookup
    lkf = scan_loop(
        lambda: lk.lookup_anchors(
            dev.mz_hash, dev.mz_posstrand, dev.bucket_off, qh, qp, qs, qv,
            max_occ=params.max_occ, hits_per_seed=params.hits_per_seed,
            bucket_len=READ_LEN, steps=params.lookup_steps,
        )
    )
    print(f"lookup_anchors      : {timed(lkf):8.2f} ms/batch")

    key, diag, rpos, fpos = jax.jit(
        lambda: lk.lookup_anchors(
            dev.mz_hash, dev.mz_posstrand, dev.bucket_off, qh, qp, qs, qv,
            max_occ=params.max_occ, hits_per_seed=params.hits_per_seed,
            bucket_len=READ_LEN, steps=params.lookup_steps,
        )
    )()

    # stage 3: chain votes (includes the sort)
    chf = scan_loop(lambda: ch.chain_votes(key, diag, rpos, fpos))
    print(f"chain_votes         : {timed(chf):8.2f} ms/batch")

    # stage 3a: just the sort
    srt = scan_loop(lambda: jnp.sort(key, axis=-1))
    print(f"  sort only         : {timed(srt):8.2f} ms/batch")

    skeys = jax.jit(lambda k: jnp.sort(k, axis=-1))(key)
    pv = scan_loop(lambda: ch._pair_votes(skeys, 128))
    print(f"  pair_votes only   : {timed(pv):8.2f} ms/batch")


if __name__ == "__main__":
    main()
