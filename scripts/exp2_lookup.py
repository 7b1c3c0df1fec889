#!/usr/bin/env python
"""Honest lookup timing: scan over DISTINCT batches (defeats LICM).

Compares the old binary-search lookup (git HEAD~, copied to
/tmp/lookup_old.py) against probe-window variants, per stage.
"""

import importlib.util
import sys
import time

sys.path.insert(0, ".")

import numpy as np

N_BATCHES = 8
GENOME_LEN = 1_000_000
N_GENOMES = 5
READ_LEN = 1024
BATCH = 2048


def load_old():
    spec = importlib.util.spec_from_file_location("lookup_old", "/tmp/lookup_old.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.index import minimizer as mz
    from monica_tpu.ops import lookup as lk

    old = load_old()
    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    shard = built.shards[0]
    dev = pl.device_shard(shard)
    # old-style tables
    old_hash = jnp.asarray(shard.mz_hash)
    old_ps = jnp.asarray((shard.mz_pos.astype(np.int32) << 1) | shard.mz_strand.astype(np.int32))
    old_off_np = old.build_bucket_offsets(shard.mz_hash)
    old_off = jnp.asarray(old_off_np)
    old_steps = old.suggest_steps(shard.mz_hash, old_off_np)

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
    cd, ld = jnp.asarray(codes), jnp.asarray(lengths)

    # precompute sketches per batch (xs for lookup stages)
    sk = jax.jit(lambda c: mz.sketch_reads_jax(c, params.n_slots, params.k, params.w))
    QH, QP, QS, QV = [], [], [], []
    for i in range(N_BATCHES):
        qh, qp, qs, qv = sk(cd[i])
        qv = qv & (qp < (ld[i][:, None] - params.k + 1))
        QH.append(qh); QP.append(qp); QS.append(qs); QV.append(qv)
    QH, QP, QS, QV = map(jnp.stack, (QH, QP, QS, QV))

    def timed(name, scan_fn, *args):
        f = jax.jit(scan_fn)
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = (time.time() - t0) / N_BATCHES * 1000
        print(f"{name:34s}: {dt:8.2f} ms/batch")

    def over_batches(body):
        def fn():
            def step(c, x):
                out = body(*x)
                return c + jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(step, jnp.float32(0), (QH, QP, QS, QV))
            return tot
        return fn

    # sketch stage alone (scan over code batches)
    def sk_scan():
        def step(c, x):
            qh, qp, qs, qv = mz.sketch_reads_jax(x, params.n_slots, params.k, params.w)
            return c + qh.astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(step, jnp.float32(0), cd)
        return tot
    timed("sketch", sk_scan)

    # old bsearch lookup
    timed("lookup OLD bsearch", over_batches(
        lambda qh, qp, qs, qv: old.lookup_anchors(
            old_hash, old_ps, old_off, qh, qp, qs, qv,
            max_occ=64, hits_per_seed=8, bucket_len=READ_LEN, steps=old_steps)))

    # new flat probe
    timed("lookup NEW flat probe W=8", over_batches(
        lambda qh, qp, qs, qv: lk.lookup_anchors(
            dev.tbl, dev.bucket_off, qh, qp, qs, qv,
            max_occ=64, hits_per_seed=8, bucket_len=READ_LEN)))

    # chain stage on one lookup output set
    from monica_tpu.ops import chain as ch
    one = jax.jit(lambda qh, qp, qs, qv: lk.lookup_anchors(
        dev.tbl, dev.bucket_off, qh, qp, qs, qv,
        max_occ=64, hits_per_seed=8, bucket_len=READ_LEN))
    KEY, DIAG, RP, FP = [], [], [], []
    for i in range(N_BATCHES):
        k_, d_, r_, f_ = one(QH[i], QP[i], QS[i], QV[i])
        KEY.append(k_); DIAG.append(d_); RP.append(r_); FP.append(f_)
    KEY, DIAG, RP, FP = map(jnp.stack, (KEY, DIAG, RP, FP))

    def ch_scan():
        def step(c, x):
            res = ch.chain_votes(*x)
            return c + res.f1.astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(step, jnp.float32(0), (KEY, DIAG, RP, FP))
        return tot
    timed("chain_votes", ch_scan)

    def sort_scan():
        def step(c, x):
            s = jnp.sort(x[0], axis=-1)
            return c + s.astype(jnp.float32).sum(), None
        tot, _ = jax.lax.scan(step, jnp.float32(0), (KEY,))
        return tot
    timed("  sort only", sort_scan)


if __name__ == "__main__":
    main()
