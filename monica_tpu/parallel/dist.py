"""Sharded classification step: shard_map + XLA collectives.

The communication design (SURVEY.md §2 parallelism table): per-read
candidate hits from every index shard are combined with an
``all_gather`` over the ``index`` axis (replacing the reference's
on-disk ``hits/<sample>_hits.pkl`` merge, `monica/genomes/
aligner.py:184-203,219-223`), and per-accession count tables are
reduced with ``psum`` over the ``data`` axis (replacing the
``alignment.pkl`` pickle merge, `aligner.py:282-302`).  Collectives
ride ICI; the host only sees final per-read results and one small
count vector per batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from monica_tpu.align import pipeline as pl
from monica_tpu.parallel.mesh import DATA_AXIS, INDEX_AXIS


def multihost_init(**kwargs) -> None:
    """Multi-host process-group bootstrap (jax.distributed). The
    reference has no distributed runtime at all (SURVEY.md §5); on TPU
    pods this is one call and the mesh spans all hosts' devices."""
    jax.distributed.initialize(**kwargs)


def make_sharded_classifier(
    mesh: Mesh,
    params: pl.ClassifyParams,
    n_accessions: int,
    count_mode: int = pl.MODE_QUERY_LENGTH,
):
    """Build the jitted SPMD step: (stacked index shards, read batch)
    -> (per-read merged results sharded over data, replicated counts).
    """

    def local_step(index, codes, lengths):
        # block-local views: index leaf shapes (S_local, ...), reads (B_local, L)
        index_local = jax.tree.map(lambda a: a[0], index)  # one shard per device
        hit = pl.classify_shard(index_local, codes, lengths, params)
        # every index shard scored this device's reads: gather all
        # shards' hits for the local reads, then merge per read.
        gathered = jax.lax.all_gather(hit, INDEX_AXIS)  # leaves (S, B_local)
        result = pl.merge_hits(gathered, params.tie_rel_tol)
        counts = pl.count_reads(result, lengths, n_accessions, count_mode)
        # every index-axis device computed the same merged result for its
        # reads; zero all but index rank 0 so a psum over BOTH axes gives
        # the global table exactly once, replicated on every device.
        keep = (jax.lax.axis_index(INDEX_AXIS) == 0).astype(counts.dtype)
        counts = jax.lax.psum(counts * keep, (DATA_AXIS, INDEX_AXIS))
        return result, counts

    index_in_spec = jax.tree.map(
        lambda _: P(INDEX_AXIS),
        pl.DeviceIndexShard(*[0] * len(pl.DeviceIndexShard._fields)),
    )
    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(index_in_spec, P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=(
            jax.tree.map(lambda _: P(DATA_AXIS), pl.ReadResult(*[0] * 6)),
            P(),
        ),
        # all_gather over the index axis makes the merged result
        # mathematically identical on every index-axis device, but the
        # varying-mesh-axes inference cannot prove it; the psum over
        # both axes likewise replicates counts.
        check_vma=False,
    )
    return jax.jit(step)
