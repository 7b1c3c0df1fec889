import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monica_tpu.align import pipeline as pl
from monica_tpu.index.build import build_index
from monica_tpu.io.encode import bucketize_reads, pad_rows
from monica_tpu.parallel import mesh as pm
from monica_tpu.parallel.dist import make_sharded_classifier
from tests.fixtures import make_fasta_gz, random_genome, sample_reads


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(21)
    tmp = tmp_path_factory.mktemp("g")
    genomes, seqs = [], []
    for i in range(6):
        g = random_genome(rng, 30_000)
        seqs.append(g)
        p = tmp / f"g{i}.fna.gz"
        make_fasta_gz(p, [(f"c{i}", g)])
        genomes.append((str(p), [f"Sp_{i}", f"A{i:03d}.1"]))
    built = build_index(genomes, n_shards=2)
    reads, labels = sample_reads(rng, seqs, 64, read_len=900, error=(0.03, 0.02, 0.02))
    return built, seqs, reads, labels


def test_sharded_classifier_matches_merge(setup):
    built, seqs, reads, labels = setup
    params = pl.ClassifyParams()
    mesh = pm.make_mesh(n_data=4, n_index=2)

    stacked, steps = pl.stack_device_shards(built.shards)
    params = params._replace(tag_bits=steps)
    step = make_sharded_classifier(mesh, params, built.meta.n_accessions, pl.MODE_BASIC)

    batches = bucketize_reads(reads)
    assert len(batches) == 1
    b = pad_rows(batches[0], 4)

    with mesh:
        sidx = pm.shard_index(mesh, stacked)
        codes, lengths = pm.shard_reads(mesh, jnp.asarray(b.codes), jnp.asarray(b.lengths))
        result, counts = step(sidx, codes, lengths)

    statuses = np.asarray(result.status)
    accs = np.asarray(result.acc_id)
    real = b.idx >= 0
    mapped = (statuses == pl.MAPPED) & real
    assert mapped.mean() > 0.8
    lab = np.asarray([labels[i] if i >= 0 else -1 for i in b.idx])
    assert (accs[mapped] == lab[mapped]).all()
    # counts equal the number of mapped reads in basic mode
    assert np.asarray(counts).sum() == mapped.sum()

    # cross-check against the single-device merged path
    hits = []
    for sh in built.shards:
        dev, steps2 = pl.device_shard(sh)
        hits.append(pl.classify_shard(dev, jnp.asarray(b.codes), jnp.asarray(b.lengths), params))
    ref = pl.merge_hits(jax.tree.map(lambda *xs: jnp.stack(xs), *hits))
    assert np.array_equal(np.asarray(ref.status)[real], statuses[real])
    assert np.array_equal(np.asarray(ref.acc_id)[real], accs[real])


def test_mesh_shapes():
    mesh = pm.make_mesh(n_data=8, n_index=1)
    assert mesh.shape == {"data": 8, "index": 1}
    mesh = pm.make_mesh(n_index=4)
    assert mesh.shape == {"data": 2, "index": 4}
