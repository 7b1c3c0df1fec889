"""Streaming runtime: routing, accumulation, consume-and-delete,
sentinels — the `multi_threaded_aligner` behavioral contract."""

import numpy as np
import pytest

from monica_tpu.align import pipeline as pl
from monica_tpu.align import runtime as rt
from monica_tpu.index.build import build_index
from monica_tpu.io import seq as seqio
from monica_tpu.stats.abundance import AbundanceState, export_tables
from tests.fixtures import make_fasta_gz, make_fastq, random_genome, sample_reads


@pytest.fixture(scope="module")
def classifier(tmp_path_factory):
    rng = np.random.default_rng(21)
    tmp = tmp_path_factory.mktemp("genomes")
    genomes, seqs = [], []
    for i in range(3):
        g = random_genome(rng, 30_000)
        seqs.append(g)
        p = tmp / f"g{i}.fna.gz"
        make_fasta_gz(p, [(f"c{i}", g)])
        genomes.append((str(p), [f"Species_{i}", f"ACC{i:03d}.1"]))
    built = build_index(genomes, n_shards=2)
    return rt.Classifier(built, pl.ClassifyParams(n_slots=64), count_mode="basic"), seqs


def test_run_once_routes_counts_and_deletes(classifier, tmp_path):
    clf, seqs = classifier
    rng = np.random.default_rng(22)
    q = tmp_path / "query"
    out = tmp_path / "out"
    q.mkdir()
    reads, labels = sample_reads(rng, seqs, 30, read_len=600, error=(0.03, 0.01, 0.01))
    make_fastq(q / "s1.fastq", reads)
    # random junk reads -> unmapped
    junk = [random_genome(rng, 500) for _ in range(5)]
    make_fastq(q / "s2.fastq", junk)

    reports = rt.run_once(
        clf, q, out, focus_taxa=frozenset({"Species_0"}), delete=True
    )
    by = {r.sample: r for r in reports}
    assert by["s1"].n_reads == 30 and by["s1"].n_mapped >= 25
    assert by["s2"].n_unmapped >= 4

    # consumed inputs deleted, routed files exist, sentinel written
    assert not (q / "s1.fastq").exists() and not (q / "s2.fastq").exists()
    assert (q / rt.S_GOING_TO_ALIGN).exists()
    mapped = list(seqio.read_fastq(q / "mapped" / "s1.fastq"))
    assert len(mapped) == by["s1"].n_mapped
    # read ids rewritten to tax units
    assert all(r.id.startswith("Species_") for r in mapped)
    # focus copy holds only Species_0 reads with ORIGINAL ids
    focus = list(seqio.read_fastq(q / "focus" / "s1.fastq"))
    assert len(focus) == by["s1"].n_focus > 0
    assert all(r.id.startswith("read") for r in focus)

    # accumulator persisted; counts equal mapped reads (basic mode)
    state = AbundanceState.load(out, clf.meta.n_accessions)
    assert state.samples["s1"].sum() == by["s1"].n_mapped

    # second invocation with new data accumulates monotonically
    make_fastq(q / "s1.fastq", reads[:10])
    rt.run_once(clf, q, out, delete=True)
    state2 = AbundanceState.load(out, clf.meta.n_accessions)
    assert state2.samples["s1"].sum() >= state.samples["s1"].sum()

    # tables export round-trips the MultiIndex schema
    norm, raw = export_tables(state2, clf.meta, out)
    assert (out / "monica.dataframe").exists()
    assert raw.index.names == ["tax_unit", "accession"]


def test_watch_stops_after_idle(classifier, tmp_path):
    clf, seqs = classifier
    q = tmp_path / "query"
    out = tmp_path / "out"
    q.mkdir()
    reports = rt.watch(clf, q, out, poll_s=0.01, max_idle_polls=2)
    assert reports == []
