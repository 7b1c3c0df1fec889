#!/usr/bin/env python
"""Experiment: lookup variants on real TPU. Not part of the package."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax
jax.config.update('jax_enable_x64', True)

R = 8
GENOME_LEN = 1_000_000
N_GENOMES = 5
READ_LEN = 1024
BATCH = 2048


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.index import minimizer as mz
    from monica_tpu.ops import lookup as lk

    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    shard = built.shards[0]
    dev, steps = pl.device_shard(shard)

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
    params = pl.ClassifyParams(n_slots=128, lookup_steps=steps)
    cd, ld = jnp.asarray(codes), jnp.asarray(lengths)

    qh, qp, qs, qv = jax.jit(
        lambda c: mz.sketch_reads_jax(c, params.n_slots, params.k, params.w)
    )(cd)
    qv = qv & (qp < (ld[:, None] - params.k + 1))

    # packed int64 table
    packed = (shard.mz_hash.astype(np.uint64) << np.uint64(32)) | (
        ((shard.mz_pos.astype(np.int64) << 1) | shard.mz_strand.astype(np.int64))
        .astype(np.uint64)
        & np.uint64(0xFFFFFFFF)
    )
    tbl64 = jnp.asarray(packed.astype(np.int64))
    M = len(packed)

    def timed(name, stage):
        def fn():
            def body(c, _):
                out = stage()
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c + leaf.astype(jnp.float32).sum(), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
            return tot

        f = jax.jit(fn)
        np.asarray(f())
        t0 = time.time()
        np.asarray(f())
        print(f"{name:28s}: {(time.time()-t0)/R*1000:8.2f} ms/batch")

    # A: current
    timed(
        "A current bsearch",
        lambda: lk.lookup_anchors(
            dev.mz_hash, dev.mz_posstrand, dev.bucket_off, qh, qp, qs, qv,
            max_occ=params.max_occ, hits_per_seed=8,
            bucket_len=READ_LEN, steps=steps,
        ),
    )

    # B: direct probe, element gathers on int64
    def probe_elem(P):
        bits = int(np.log2(dev.bucket_off.shape[-1] - 1))
        b = (qh >> (32 - bits)).astype(jnp.int32)
        blo = dev.bucket_off[b]
        bhi = dev.bucket_off[b + 1]
        j = jnp.arange(P, dtype=jnp.int32)
        take = jnp.clip(blo[..., None] + j, 0, M - 1)
        e = tbl64[take]  # (B,S,P)
        ehash = jax.lax.shift_right_logical(e, jnp.int64(32)).astype(jnp.uint32)
        ok = (ehash == qh[..., None]) & ((blo[..., None] + j) < bhi[..., None]) & qv[..., None]
        ps = (e & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
        return ok.astype(jnp.int32).sum(), ps.sum()

    timed("B probe64 elem P=8", lambda: probe_elem(8))
    timed("B probe64 elem P=4", lambda: probe_elem(4))

    # C: slice-mode row gather on int64
    def probe_slice(P):
        bits = int(np.log2(dev.bucket_off.shape[-1] - 1))
        b = (qh >> (32 - bits)).astype(jnp.int32)
        blo = dev.bucket_off[b]
        bhi = dev.bucket_off[b + 1]
        e = lk._row_gather(tbl64, blo, P)  # (B,S,P)
        ehash = jax.lax.shift_right_logical(e, jnp.int64(32)).astype(jnp.uint32)
        j = jnp.arange(P, dtype=jnp.int32)
        ok = (ehash == qh[..., None]) & ((blo[..., None] + j) < bhi[..., None]) & qv[..., None]
        ps = (e & jnp.int64(0xFFFFFFFF)).astype(jnp.int32)
        return ok.astype(jnp.int32).sum(), ps.sum()

    timed("C probe64 slice P=8", lambda: probe_slice(8))

    # D: element-gather int32 pair (hash table + ps table separately)
    def probe_pair(P):
        bits = int(np.log2(dev.bucket_off.shape[-1] - 1))
        b = (qh >> (32 - bits)).astype(jnp.int32)
        blo = dev.bucket_off[b]
        bhi = dev.bucket_off[b + 1]
        j = jnp.arange(P, dtype=jnp.int32)
        take = jnp.clip(blo[..., None] + j, 0, M - 1)
        eh = dev.mz_hash[take]
        ps = dev.mz_posstrand[take]
        ok = (eh == qh[..., None]) & ((blo[..., None] + j) < bhi[..., None]) & qv[..., None]
        return ok.astype(jnp.int32).sum(), ps.sum()

    timed("D probe32x2 elem P=8", lambda: probe_pair(8))

    # sanity: B vs A hit agreement
    key_a, diag_a, rp_a, fp_a = jax.jit(
        lambda: lk.lookup_anchors(
            dev.mz_hash, dev.mz_posstrand, dev.bucket_off, qh, qp, qs, qv,
            max_occ=params.max_occ, hits_per_seed=8,
            bucket_len=READ_LEN, steps=steps,
        )
    )()
    n_valid_a = int((np.asarray(key_a) != lk.INVALID_KEY).sum())
    nb, _ = jax.jit(lambda: probe_elem(8))()
    print(f"anchors: current={n_valid_a}  probe={int(nb)}")


def main2():
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _tiny_index
    from monica_tpu.align import pipeline as pl
    from monica_tpu.index import minimizer as mz
    from monica_tpu.ops import lookup as lk

    built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
    shard = built.shards[0]
    dev = pl.device_shard(shard)

    rng = np.random.default_rng(3)
    codes = np.stack([
        seqs[rng.integers(0, N_GENOMES)][s:s+READ_LEN]
        for s in rng.integers(0, GENOME_LEN - READ_LEN, BATCH)
    ]).astype(np.uint8)
    lengths = np.full(BATCH, READ_LEN, np.int32)
    params = pl.ClassifyParams(n_slots=128)
    cd, ld = jnp.asarray(codes), jnp.asarray(lengths)
    qh, qp, qs, qv = jax.jit(lambda c: mz.sketch_reads_jax(c, params.n_slots, params.k, params.w))(cd)
    qv = qv & (qp < (ld[:, None] - params.k + 1))

    def timed(name, stage):
        def fn():
            def body(c, _):
                out = stage()
                leaf = jax.tree_util.tree_leaves(out)[0]
                return c + leaf.astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=R)
            return tot
        f = jax.jit(fn)
        np.asarray(f())
        t0 = time.time()
        np.asarray(f())
        print(f"{name:28s}: {(time.time()-t0)/R*1000:8.2f} ms/batch")

    # E: current production (M,2) window gather
    timed("E prod (M,2) gather", lambda: lk.lookup_anchors(
        dev.tbl, dev.bucket_off, qh, qp, qs, qv,
        max_occ=params.max_occ, hits_per_seed=8, bucket_len=READ_LEN))

    # F: flat interleaved 1D table
    flat_tbl = jnp.asarray(np.asarray(dev.tbl).reshape(-1))
    def probe_flat(W):
        bits = int(np.log2(dev.bucket_off.shape[-1] - 1))
        b = (qh >> (32 - bits)).astype(jnp.int32)
        off = lk._row_gather(dev.bucket_off, b, 2)
        blo, bhi = off[..., 0], off[..., 1]
        e = lk._row_gather(flat_tbl, 2 * blo, 2 * W).reshape(*qh.shape, W, 2)
        ehash = e[..., 0]
        ps = e[..., 1]
        qh_i32 = jax.lax.bitcast_convert_type(qh, jnp.int32)
        ok = (ehash == qh_i32[..., None]) & qv[..., None]
        return ok.astype(jnp.int32).sum(), ps.sum()
    timed("F probe flat 1D W=8", lambda: probe_flat(8))

if __name__ == "__main__":
    main2()
