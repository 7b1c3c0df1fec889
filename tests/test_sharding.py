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


def test_mesh_more_shards_than_index_ranks(tmp_path):
    """A 5-shard index on a (data=4, index=2) mesh (VERDICT r3 item 2):
    each index rank lax.maps over its local shard group and outputs
    must be identical to the single-device grouped path — the
    reference's every-read-vs-every-chunk contract
    (`aligner.py:91-103`) regardless of chunk count vs devices."""
    from monica_tpu.align import runtime as rt
    from monica_tpu.stats.abundance import AbundanceState
    from tests.fixtures import make_fastq

    rng = np.random.default_rng(77)
    genomes, seqs = [], []
    for i in range(5):
        g = random_genome(rng, 20_000)
        seqs.append(g)
        p = tmp_path / f"g{i}.fna.gz"
        make_fasta_gz(p, [(f"c{i}", g)])
        genomes.append((str(p), [f"Sp_{i}", f"A{i:03d}.1"]))
    built = build_index(genomes, n_shards=5)
    assert len(built.shards) == 5

    mesh = pm.make_mesh(n_data=4, n_index=2)
    mclf = rt.Classifier(built, pl.ClassifyParams(n_slots=64),
                         count_mode="basic", mesh=mesh)
    sclf = rt.Classifier(built, pl.ClassifyParams(n_slots=64),
                         count_mode="basic")

    reads, labels = sample_reads(rng, seqs, 40, read_len=700,
                                 error=(0.03, 0.02, 0.02))
    outs = {}
    for name, c in [("single", sclf), ("mesh", mclf)]:
        q = tmp_path / f"q_{name}"
        out = tmp_path / f"o_{name}"
        q.mkdir()
        make_fastq(q / "s1.fastq", reads)
        reports = rt.run_once(c, q, out)
        state = AbundanceState.load(out, c.meta.n_accessions)
        outs[name] = (reports[0], state.samples["s1"].copy(),
                      (q / "mapped" / "s1.fastq").read_bytes())
    r_s, counts_s, mapped_s = outs["single"]
    r_m, counts_m, mapped_m = outs["mesh"]
    assert r_s.n_mapped == r_m.n_mapped >= 30
    assert np.array_equal(counts_s, counts_m)
    assert mapped_s == mapped_m


def test_mesh_group_stacking_bounds_skew_hbm():
    """One oversized shard must not multiply across every index rank's
    HBM copy: with size-class grouping each rank's resident bytes are
    bounded by the HEAVIEST rank's own shards (+ class rounding), not
    by ceil(S/n_index) x max_shard as global-max rectangular stacking
    would cost.  (A singleton big class still costs one inert padded
    row on the other rank — the structural floor of uniform SPMD:
    every rank runs the same static shapes.)"""
    from monica_tpu.index.build import build_index_from_arrays

    rng = np.random.default_rng(78)
    # 1 x 4 Mb + 4 x 256 kb skew
    sizes = [4_000_000] + [256_000] * 4
    seqs = [rng.integers(0, 4, n).astype(np.uint8) for n in sizes]
    built = build_index_from_arrays(seqs, n_shards=5)
    groups, tb = pl.stack_mesh_shard_groups(built.shards, n_index=2)

    per_rank = np.zeros(2, np.int64)
    for g in groups:
        S = np.asarray(g.ref_codes).shape[0]
        s_local = S // 2
        for r in range(2):
            sl = slice(r * s_local, (r + 1) * s_local)
            per_rank[r] += sum(np.asarray(a)[sl].nbytes for a in g)

    # what the r3 layout would have cost had it even supported 5 shards
    # on 2 ranks: every shard padded to the global max, 3 rows per rank
    rect, _ = pl.stack_device_shards(built.shards, tag_bits=tb)
    naive_per_rank = 3 * sum(
        np.asarray(a)[:1].nbytes for a in rect
    )
    assert per_rank.max() < naive_per_rank * 0.45, (per_rank, naive_per_rank)

    # heaviest-rank bound: no rank exceeds ~1.25x the max own-bytes
    def shard_bytes(s):
        from monica_tpu.ops import lookup as lk

        table = (1 << lk.row_bits_for(s.n_minimizers)) * lk.ROW_SLOTS * 4
        return len(s.ref_codes) * 3 + table

    own = sorted(shard_bytes(s) for s in built.shards)
    heaviest_own = max(own[-1], sum(own[:-1]))
    assert per_rank.max() <= heaviest_own * 1.25, (per_rank, heaviest_own)


def test_resolve_mesh_divisor_policy(monkeypatch):
    """Auto mode picks the largest device-count divisor <= n_shards
    (all devices used, data parallelism preserved); explicit n_data
    clamps the index axis to fit."""
    from monica_tpu.orchestrate import resolve_mesh

    # 8 devices, 5 shards: (data=2, index=4), not (1, 5)
    mesh = resolve_mesh(-1, 5)
    assert dict(mesh.shape) == {"data": 2, "index": 4}
    # 8 devices, 3 shards: divisors <= 3 -> index=2
    mesh = resolve_mesh(-1, 3)
    assert dict(mesh.shape) == {"data": 4, "index": 2}
    # 8 devices, 16 shards: index axis caps at 8 -> (1, 8) degenerates
    # data to 1 but uses all devices for index
    mesh = resolve_mesh(-1, 16)
    assert dict(mesh.shape) == {"data": 1, "index": 8}
    # explicit n_data=4 with 5 shards: index = 8//4 = 2
    mesh = resolve_mesh(4, 5)
    assert dict(mesh.shape) == {"data": 4, "index": 2}
    # single device need -> None (stacked path)
    assert resolve_mesh(1, 5) is None


def test_fetch_local_rows_single_process():
    """fetch_local_rows reassembles a data-sharded array's rows in
    global order, deduping index-axis replicas."""
    import jax

    from monica_tpu.parallel import mesh as pm
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = pm.make_mesh(n_data=4, n_index=2)
    x = np.arange(32, dtype=np.int32).reshape(8, 4)
    gx = jax.device_put(x, NamedSharding(mesh, P(pm.DATA_AXIS, None)))
    got = pm.fetch_local_rows(gx)
    assert np.array_equal(got, x)


def test_sync_batch_schedule_slot_overflow():
    """A sample needing more than the allgather plan capacity fails
    with a clear message instead of silently truncating."""
    import pytest

    from monica_tpu.align import runtime as rt
    from monica_tpu.io import encode as enc

    batches = [
        enc.ReadBatch(
            np.zeros((4, 512), np.uint8), np.zeros(4, np.int32),
            np.zeros(4, np.int32),
        )
        for _ in range(rt._MAX_SCHED_SLOTS + 1)
    ]
    with pytest.raises(ValueError, match="max_batch"):
        rt._sync_batch_schedule(batches)
