import numpy as np
import pandas as pd
import pytest

from monica_tpu.index.build import IndexMeta
from monica_tpu.stats import abundance as ab


def _meta():
    return IndexMeta(
        tax_units=["Escherichia_coli", "Escherichia_coli", "Bacillus_subtilis"],
        accessions=["AC1.1", "AC2.1", "AC3.1"],
        genome_lengths=np.array([5_000_000, 4_800_000, 4_200_000], dtype=np.int64),
    )


def golden_normalizer(alignment: dict, genomes_length: dict) -> dict:
    """Pure-python mirror of the reference normalizer semantics
    (`monica/genomes/aligner.py:305-319`): BPB = count/length,
    BPM = BPB / sample_total."""
    out = {}
    for sample, taxa in alignment.items():
        bpb = {
            tu: {acc: c / genomes_length[acc] for acc, c in counter.items()}
            for tu, counter in taxa.items()
        }
        total = sum(v for tu in bpb.values() for v in tu.values())
        out[sample] = {
            tu: {acc: v / total for acc, v in counter.items()}
            for tu, counter in bpb.items()
        }
    return out


def test_normalize_matches_reference_semantics():
    meta = _meta()
    state = ab.AbundanceState(3)
    state.update("s1", np.array([100, 0, 50]))
    state.update("s2", np.array([0, 30, 10]))

    got = ab.normalize(state, meta.genome_lengths)

    alignment = {
        "s1": {"Escherichia_coli": {"AC1.1": 100}, "Bacillus_subtilis": {"AC3.1": 50}},
        "s2": {"Escherichia_coli": {"AC2.1": 30}, "Bacillus_subtilis": {"AC3.1": 10}},
    }
    lengths = dict(zip(meta.accessions, meta.genome_lengths.tolist()))
    want = golden_normalizer(alignment, lengths)

    assert got["s1"][0] == pytest.approx(want["s1"]["Escherichia_coli"]["AC1.1"])
    assert got["s1"][2] == pytest.approx(want["s1"]["Bacillus_subtilis"]["AC3.1"])
    assert got["s2"][1] == pytest.approx(want["s2"]["Escherichia_coli"]["AC2.1"])
    # per-sample normalized sums are 1
    assert got["s1"].sum() == pytest.approx(1.0)
    assert got["s2"].sum() == pytest.approx(1.0)


def test_accumulator_is_monotone_and_persistent(tmp_path):
    state = ab.AbundanceState(3)
    state.update("s1", np.array([1, 2, 3]))
    state.update("s1", np.array([10, 0, 0]))  # second batch, same sample
    assert state.samples["s1"].tolist() == [11, 2, 3]
    state.save(tmp_path)
    again = ab.AbundanceState.load(tmp_path, 3)
    assert again.samples["s1"].tolist() == [11, 2, 3]
    ab.AbundanceState.clear(tmp_path)  # helpers.initializer analog
    fresh = ab.AbundanceState.load(tmp_path, 3)
    assert fresh.samples == {}


def test_dataframe_schema_roundtrip(tmp_path):
    """CSV schema parity: MultiIndex (tax_unit, accession) x samples,
    read back with index_col=(0,1) (monica.py:784-785)."""
    meta = _meta()
    state = ab.AbundanceState(3)
    state.update("sampleA", np.array([100, 0, 50]))
    state.update("sampleB", np.array([5, 30, 0]))
    norm, raw = ab.export_tables(state, meta, tmp_path)

    back = ab.read_dataframe(tmp_path / ab.DATAFRAME_FILENAME)
    assert list(back.columns) == ["sampleA", "sampleB"]
    assert ("Escherichia_coli", "AC1.1") in back.index
    # absent pair is NaN, not 0 (sparse Counter semantics)
    assert np.isnan(back.loc[("Bacillus_subtilis", "AC3.1"), "sampleB"])
    raw_back = ab.read_dataframe(tmp_path / ab.RAW_DATAFRAME_FILENAME)
    assert raw_back.loc[("Escherichia_coli", "AC1.1"), "sampleA"] == 100


def test_barplot_renders(tmp_path):
    from monica_tpu.plots import barplot as bp

    meta = _meta()
    state = ab.AbundanceState(3)
    state.update("s1", np.array([100, 20, 50]))
    state.update("s2", np.array([3, 30, 10]))
    norm, raw = ab.export_tables(state, meta, tmp_path)
    out = bp.plotter(norm, raw, tmp_path, reads_threshold=0, hosts=["Bacillus_subtilis"], guests=["Escherichia_coli"], mode="basic")
    text = out.read_text()
    assert "Escherichia_coli" in text
    assert "Bacillus_subtilis_(host)" in text
    assert "svg" in text


def test_barplot_low_reads_filter(tmp_path):
    from monica_tpu.plots import barplot as bp

    meta = _meta()
    state = ab.AbundanceState(3)
    state.update("s1", np.array([100, 0, 2]))  # taxon 3 raw <= 15 everywhere
    norm, raw = ab.export_tables(state, meta, tmp_path)
    out = bp.plotter(norm, raw, tmp_path, reads_threshold=15)
    text = out.read_text()
    assert "Bacillus_subtilis" not in text


def test_by_taxunit_sums_accessions():
    from monica_tpu.plots import barplot as bp

    idx = pd.MultiIndex.from_tuples(
        [("E", "A1"), ("E", "A2"), ("B", "A3")], names=["tax_unit", "accession"]
    )
    df = pd.DataFrame({"s": [0.1, 0.2, np.nan]}, index=idx)
    t = bp.by_taxunit(df)
    assert t.loc["E", "s"] == pytest.approx(0.3)
    assert t.loc["B", "s"] == pytest.approx(0.0)
