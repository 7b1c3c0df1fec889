#!/usr/bin/env python
"""Per-stage timing of the classification pipeline on the real device.

Times the bench workload with stages progressively enabled to attribute
wall-clock: sketch only / +lookup / +chain / +extend. Each variant runs
as one lax.scan dispatch over resident batches, synced by host fetch
(block_until_ready does not sync through the tunnel).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from monica_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_index
from monica_tpu.align import pipeline as pl
from monica_tpu.ops import lookup as lk
from monica_tpu.ops import chain as ch

GENOME_LEN = 1_000_000
N_GENOMES = 5
READ_LEN = 1024
BATCH = 2048
N_BATCHES = 8


def make_reads(seqs, rng, sub=0.05):
    rows = []
    for g in rng.integers(0, len(seqs), BATCH * N_BATCHES):
        s = rng.integers(0, len(seqs[g]) - READ_LEN)
        rows.append(seqs[g][s : s + READ_LEN])
    codes = np.stack(rows).astype(np.uint8)
    m = rng.random(codes.shape) < sub
    codes[m] = rng.integers(0, 4, int(m.sum()))
    return codes.reshape(N_BATCHES, BATCH, READ_LEN)


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = time.time() - t0
    n = BATCH * N_BATCHES
    print(f"{name:28s} {dt*1000:8.1f} ms   {n/dt:10.0f} reads/s")
    return dt


def main():
    zymo = "--zymo" in sys.argv
    rng = np.random.default_rng(3)
    if zymo:
        # BASELINE.json config-2 scale: ~64 Mbase in 2 shards (bench.py)
        from monica_tpu.evaluation import zymo_community
        from monica_tpu.index.build import build_index_from_arrays

        seqs = zymo_community(rng)
        built = build_index_from_arrays(seqs, n_shards=1)  # fits 2^26 (bench.py)
        dev, steps = pl.device_shard(built.shards[0])
    else:
        built, seqs = _tiny_index(n_genomes=N_GENOMES, n_shards=1, glen=GENOME_LEN)
        dev, steps = pl.device_shard(built.shards[0])
    codes = jnp.asarray(make_reads(seqs, rng))
    lengths = jnp.asarray(np.full((N_BATCHES, BATCH), READ_LEN, np.int32))
    params = pl.ClassifyParams(n_slots=128, tag_bits=steps)
    params_noext = params._replace(extend=False)
    n_acc = built.meta.n_accessions

    def scan_over(fn):
        def run(codes, lengths):
            def body(c, b):
                return c + 1, fn(b[0], b[1])
            return jax.lax.scan(body, 0, (codes, lengths))[1]
        return jax.jit(run)

    # stage 1: sketch only
    f_sketch = scan_over(lambda c, l: pl.sketch_batch(c, l, params)[0])
    # stage 2: sketch + lookup
    def lkp(c, l):
        qh, qp, qs, qv = pl.sketch_batch(c, l, params)
        key, diag, rpos, fpos = lk.lookup_anchors(
            dev.mz_rows, qh, qp, qs, qv, tag_bits=params.tag_bits, bucket_len=READ_LEN
        )
        return key.sum() + diag.sum() + rpos.sum() + fpos.sum()
    f_lookup = scan_over(lkp)
    # stage 3: + chain (sort + votes)
    def chn(c, l):
        qh, qp, qs, qv = pl.sketch_batch(c, l, params)
        key, diag, rpos, fpos = lk.lookup_anchors(
            dev.mz_rows, qh, qp, qs, qv, tag_bits=params.tag_bits, bucket_len=READ_LEN
        )
        res = ch.chain_votes(key, diag, rpos, fpos)
        # keep EVERY output live: XLA's dead-code pruning of partial
        # ChainResult outputs triggers a pathological 30x-slower
        # recompute schedule (measured on CPU)
        return sum(x.astype(jnp.int32).sum() for x in res)
    f_chain = scan_over(chn)
    # stage 4: full, no extension
    f_noext = scan_over(
        lambda c, l: pl.classify_shard(dev, c, l, params_noext).acc_id
    )
    # stage 5: full with extension
    f_full = scan_over(lambda c, l: pl.classify_shard(dev, c, l, params).acc_id)

    ref_mb = sum(len(s) for s in seqs) / 1e6
    print(
        f"device={jax.devices()[0].device_kind} index={ref_mb:.0f}Mbase "
        f"shards={len(built.shards)} B={BATCH} x {N_BATCHES} L={READ_LEN}",
        flush=True,
    )
    print("per-shard stages (shard 0):", flush=True)
    quick = "--quick" in sys.argv  # 3 compiles instead of 5 (each jit
    # variant costs ~10 min of remote compile through the axon tunnel)
    timed("sketch", f_sketch, codes, lengths)
    if not quick:
        timed("sketch+lookup", f_lookup, codes, lengths)
        timed("sketch+lookup+chain", f_chain, codes, lengths)
    timed("full (no extend)", f_noext, codes, lengths)
    timed("full (+extend)", f_full, codes, lengths)
    if len(built.shards) > 1:
        groups, _ = pl.stack_device_shard_groups(built.shards)
        f_grouped = scan_over(
            lambda c, l: pl.classify_batch_grouped(
                groups, c, l, params, n_acc, pl.MODE_BASIC
            )[0].status
        )
        print("end-to-end (all shards):")
        timed("full grouped", f_grouped, codes, lengths)


if __name__ == "__main__":
    main()
