"""Pipeline with banded-extension refinement enabled (extend=True)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monica_tpu.align import pipeline as pl
from monica_tpu.index.build import build_index
from monica_tpu.io.encode import bucketize_reads
from tests.fixtures import make_fasta_gz, random_genome, sample_reads


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    rng = np.random.default_rng(17)
    tmp = tmp_path_factory.mktemp("genomes")
    genomes, seqs = [], []
    for i in range(3):
        g = random_genome(rng, 30_000)
        seqs.append(g)
        path = tmp / f"g{i}.fna.gz"
        make_fasta_gz(path, [(f"contig{i}", g)])
        genomes.append((str(path), [f"Species_{i}", f"ACC{i:03d}.1"]))
    return build_index(genomes, n_shards=1), seqs


def test_extension_refines_identity_and_keeps_assignments(small_index):
    built, seqs = small_index
    rng = np.random.default_rng(18)
    reads, labels = sample_reads(rng, seqs, 48, read_len=480, error=(0.05, 0, 0))
    batch = bucketize_reads(reads)[0]
    codes, lengths = jnp.asarray(batch.codes), jnp.asarray(batch.lengths)

    dev, steps = pl.device_shard(built.shards[0])
    base = pl.ClassifyParams(n_slots=64, tag_bits=steps)
    with_ext = base._replace(extend=True, band=128, extend_impl="jnp")
    n_acc = built.meta.n_accessions

    r0, _ = pl.classify_batch(dev, codes, lengths, base, n_acc, pl.MODE_QUERY_LENGTH)
    r1, _ = pl.classify_batch(dev, codes, lengths, with_ext, n_acc, pl.MODE_QUERY_LENGTH)

    m0 = np.asarray(r0.status) == pl.MAPPED
    m1 = np.asarray(r1.status) == pl.MAPPED
    # extension must not change which reads pass the chain/mapq gate
    np.testing.assert_array_equal(m0, m1)
    assert m1.sum() > 40
    acc1 = np.asarray(r1.acc_id)
    truth = np.asarray(labels)[np.asarray(batch.idx)]
    assert (acc1[m1] == truth[m1]).mean() > 0.95

    # alignment-based identity at 5% substitutions: NM/mlen should land
    # near 0.05/0.95, far tighter than the k-th-root statistical estimate
    inv = np.asarray(r1.inv_identity)[m1]
    assert 0.01 < np.median(inv) < 0.12
    # mlen from extension is a real matched-base count
    mlen = np.asarray(r1.mlen)[m1]
    lens = np.asarray(batch.lengths)[m1]
    assert np.all(mlen <= lens)
    assert np.median(mlen / lens) > 0.75
