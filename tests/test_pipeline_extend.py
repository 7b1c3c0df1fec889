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


def test_rescue_flips_low_seed_reads_and_skips_clean_batches(small_index):
    """The budgeted rescue path (now under lax.cond): noisy short reads
    that fail the vote gate get flipped to MAPPED by alignment
    identity, while a clean batch (zero candidates -> the cond's skip
    branch) produces results identical to the vote-only pipeline."""
    import jax.numpy as jnp

    from monica_tpu.io.encode import bucketize_reads
    from tests.fixtures import sample_reads

    built, seqs = small_index
    dev, tb = pl.device_shard(built.shards[0])
    n_acc = built.meta.n_accessions
    rng = np.random.default_rng(70)

    def classify(reads, params):
        (b,) = bucketize_reads(reads)
        res, _ = pl.classify_batch(
            dev, jnp.asarray(b.codes), jnp.asarray(b.lengths),
            params._replace(tag_bits=tb), n_acc, pl.MODE_BASIC,
        )
        return np.asarray(res.status)

    # high-error short reads: many fail the vote/mapq gate
    noisy, labels = sample_reads(
        rng, seqs, 64, read_len=300, error=(0.08, 0.05, 0.05)
    )
    st_rescue = classify(noisy, pl.ClassifyParams(extend_mode="rescue"))
    st_off = classify(noisy, pl.ClassifyParams(extend=False))
    flipped = ((st_rescue == pl.MAPPED) & (st_off == pl.UNMAPPED)).sum()
    assert flipped > 0, "rescue flipped nothing at r9_old error rates"
    # rescue never un-maps a vote-passed read
    assert not ((st_rescue == pl.UNMAPPED) & (st_off == pl.MAPPED)).any()

    # clean reads: no candidates, the skip branch runs — identical to
    # the vote-only pipeline
    clean, _ = sample_reads(rng, seqs, 64, read_len=300, error=(0, 0, 0))
    st_clean_rescue = classify(clean, pl.ClassifyParams(extend_mode="rescue"))
    st_clean_off = classify(clean, pl.ClassifyParams(extend=False))
    assert np.array_equal(st_clean_rescue, st_clean_off)
    assert (st_clean_rescue == pl.MAPPED).mean() > 0.9
