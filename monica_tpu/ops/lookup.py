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

from monica_tpu.index.minimizer import INVALID_HASH

# diagonal quantization: anchors of one gapless-ish chain share a bin.
DIAG_SHIFT = 8  # 256-base bins
INVALID_KEY = jnp.int32(1 << 30)


def lookup_anchors(
    mz_hash,  # (M,) uint32 sorted
    mz_pos,  # (M,) int32
    mz_strand,  # (M,) bool/uint8
    q_hash,  # (B, S) uint32 read minimizer hashes
    q_pos,  # (B, S) int32 read positions
    q_strand,  # (B, S) bool
    q_valid,  # (B, S) bool
    read_len,  # (B,) int32
    max_occ: int = 64,
    hits_per_seed: int = 8,
    bucket_len: int = 0,  # L, for diag offset bias
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

    lo = jnp.searchsorted(mz_hash, q_hash, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(mz_hash, q_hash, side="right").astype(jnp.int32)
    count = hi - lo
    seed_ok = (
        q_valid
        & (q_hash != INVALID_HASH)
        & (count > 0)
        & (count <= max_occ)  # repetitive-seed filter (minimap2 mid_occ analog)
    )

    # expand each seed into up to C hits
    j = jnp.arange(C, dtype=jnp.int32)  # (C,)
    take = lo[..., None] + j  # (B, S, C)
    hit_ok = seed_ok[..., None] & (j < count[..., None])
    take = jnp.clip(take, 0, mz_pos.shape[0] - 1)
    ref_pos = mz_pos[take]  # (B, S, C)
    ref_strand = mz_strand[take].astype(jnp.bool_)

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
