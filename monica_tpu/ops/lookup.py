"""Seed lookup: read minimizers -> reference anchors.

The mappy ``index.map(seq)`` seed-finding stage
(`monica/genomes/aligner.py:193`) re-designed for XLA: the index is a
hash-sorted flat table, lookup is a batched ``searchsorted`` (log2(M)
gathers, no pointer-chasing hash buckets), and every read gets a fixed
number of anchor slots so shapes stay static under ``jit``.

Anchor = (key, diag, read_pos, ref_pos) where ``key`` packs
(orientation, quantized diagonal) into an int32 for sort-based chain
voting in :mod:`monica_tpu.ops.chain`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from monica_tpu.index.minimizer import INVALID_HASH

# diagonal quantization: anchors of one gapless-ish chain share a bin.
DIAG_SHIFT = 8  # 256-base bins
# NB: a plain numpy scalar, NOT jnp — a module-level jnp array is a
# committed device constant that defeats XLA constant folding (measured
# 2000x slower lookups and minutes of extra compile time on TPU).
INVALID_KEY = np.int32(1 << 30)


def directory_bits(n_minimizers: int) -> int:
    """Directory sized ~4x the table (few-entry buckets) within
    [10, 22] bits — at 22 bits the directory is 16 MB, still cheap in
    HBM next to a table that large."""
    if n_minimizers < 2:
        return 10
    return int(np.clip(np.ceil(np.log2(n_minimizers)) + 2, 10, 22))


def build_bucket_offsets(sorted_hash, bits: int | None = None) -> "np.ndarray":
    """Host-side: bucket directory off[b] = first index with
    hash >> (32-bits) >= b.  off has 2^bits + 1 entries (int32); the
    bit width is recovered from the array length on device."""
    bits = bits if bits is not None else directory_bits(len(sorted_hash))
    bounds = (np.arange(1 << bits, dtype=np.uint64) << (32 - bits)).astype(np.uint32)
    off = np.searchsorted(np.asarray(sorted_hash), bounds, side="left")
    return np.concatenate([off, [len(sorted_hash)]]).astype(np.int32)


def suggest_steps(sorted_hash, bucket_off) -> int:
    """Binary-search depth covering the largest *mixed* bucket.  A
    bucket whose size is dominated by one repeated hash value needs no
    extra depth: an unconverged search still lands inside the equal
    range, and hits are equality-checked."""
    sizes = np.diff(np.asarray(bucket_off))
    mx = int(sizes.max()) if len(sizes) else 1
    return max(1, int(np.ceil(np.log2(mx + 1))))


def _row_gather(table, start, length: int):
    """Gather ``length`` contiguous entries per start index.

    table: (M,), start: (B, S) int32 -> (B, S, length).  Lowered as one
    sliced gather (one descriptor per seed, not per element); CLIP mode
    shifts a slice back when it would overrun the table end, which is
    benign here because hits are equality-checked afterwards.
    """
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,),
        collapsed_slice_dims=(),
        start_index_map=(0,),
    )
    return jax.lax.gather(
        table,
        jnp.maximum(start, 0)[..., None],
        dnums,
        slice_sizes=(length,),
        mode=jax.lax.GatherScatterMode.CLIP,
    )


def lookup_anchors(
    mz_hash,  # (M,) uint32 sorted
    mz_posstrand,  # (M,) int32 packed (pos << 1 | strand)
    bucket_off,  # (2^BUCKET_BITS + 1,) int32 directory
    q_hash,  # (B, S) uint32 read minimizer hashes
    q_pos,  # (B, S) int32 read positions
    q_strand,  # (B, S) bool
    q_valid,  # (B, S) bool
    max_occ: int = 64,
    hits_per_seed: int = 8,
    bucket_len: int = 0,  # L, for diag offset bias
    steps: int = 16,  # binary-search iterations within a bucket
):
    """Return per-read anchors with packed chain keys.

    Outputs, each (B, S*hits_per_seed):
      key:      int32 packed (strand, diag bin); INVALID_KEY when unused
      diag:     int32 unquantized diagonal (ref-read for fwd, ref+read for rc)
      read_pos: int32
      ref_pos:  int32
    """
    B, S = q_hash.shape
    C = hits_per_seed
    M = mz_hash.shape[0]

    # bucket directory narrows the search to a handful of iterations;
    # equal-range [lo, lo2) via two branchless binary searches (for
    # q and q+1).  Gather budget per seed: 2*steps + C element gathers
    # (slice-mode lax.gather measured >10x slower on this backend).
    bits = int(np.log2(bucket_off.shape[-1] - 1))
    b = (q_hash >> (32 - bits)).astype(jnp.int32)
    blo = bucket_off[b]
    bhi = bucket_off[b + 1]

    def bsearch(target):
        lo, hi = blo, bhi
        for _ in range(steps):
            mid = (lo + hi) >> 1
            go = mz_hash[jnp.clip(mid, 0, M - 1)] < target
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, mid)
        return lo

    lo = bsearch(q_hash)
    # even when q+1 crosses into the next bucket, searching [blo, bhi)
    # converges to bhi == end of q's run, so the count stays exact.
    count = bsearch(q_hash + 1) - lo
    seed_ok = (
        q_valid & (q_hash != INVALID_HASH) & (count > 0) & (count <= max_occ)
    )

    # expand each seed into up to C hits within the equal range
    j = jnp.arange(C, dtype=jnp.int32)  # (C,)
    take = jnp.clip(lo[..., None] + j, 0, M - 1)  # (B, S, C)
    hit_ok = seed_ok[..., None] & (j < count[..., None])
    ps = mz_posstrand[take]  # (B, S, C)
    ref_pos = ps >> 1
    ref_strand = (ps & 1).astype(jnp.bool_)

    # anchor orientation: read maps forward iff read/ref canonical
    # strands agree at the shared minimizer
    rc = q_strand[..., None] ^ ref_strand  # (B, S, C) True = rc mapping
    rp = q_pos[..., None]  # (B, S, C) broadcast read pos
    diag = jnp.where(rc, ref_pos + rp, ref_pos - rp)

    L = bucket_len
    dbin = (diag + L) >> DIAG_SHIFT
    key = jnp.where(
        hit_ok,
        (rc.astype(jnp.int32) << 24) | dbin,
        INVALID_KEY,
    )

    flat = lambda x: x.reshape(B, S * C)
    return (
        flat(key),
        flat(diag),
        flat(jnp.broadcast_to(rp, rc.shape)),
        flat(ref_pos),
    )
