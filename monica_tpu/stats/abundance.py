"""Abundance accumulation, normalization, and table export.

Re-designs the reference's pickle-based accumulator and nested-dict
normalizer with flat per-accession vectors (device-friendly):

* cross-batch accumulator  <- `alignment_update` merging Counters into
  ``alignment.pkl`` (`monica/genomes/aligner.py:282-302`);
* BPB/BPM normalization    <- `normalizer` (`aligner.py:305-319`):
  BPB = count / genome_length[accession];  BPM = BPB / sample_total;
* MultiIndex (tax_unit, accession) x samples CSV schema  <-
  `alignment_to_data_frame` (`aligner.py:322-325`), public API used by
  ``plot_only`` (`monica/monica.py:784-785`).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pandas as pd

from monica_tpu.index.build import IndexMeta

DATAFRAME_FILENAME = "monica.dataframe"
RAW_DATAFRAME_FILENAME = "raw_monica.dataframe"
STATE_FILENAME = "alignment.npz"  # the alignment.pkl analog


@dataclass
class AbundanceState:
    """Per-sample per-accession count accumulator (int64 on host).

    The monotone cross-batch state that makes re-invocation idempotent
    (SURVEY.md §3.4's real-time contract).
    """

    n_accessions: int
    samples: dict[str, np.ndarray] = field(default_factory=dict)

    def update(self, sample: str, batch_counts: np.ndarray) -> None:
        if sample not in self.samples:
            self.samples[sample] = np.zeros(self.n_accessions, dtype=np.int64)
        self.samples[sample] += batch_counts.astype(np.int64)

    # -- persistence (cleared at fresh-run start, reference helpers.py:30-32)
    def save(self, folder: str | os.PathLike) -> None:
        names = sorted(self.samples)
        np.savez_compressed(
            Path(folder) / STATE_FILENAME,
            names=np.asarray(names, dtype=object),
            counts=np.stack([self.samples[n] for n in names])
            if names
            else np.zeros((0, self.n_accessions), np.int64),
            n_accessions=np.int64(self.n_accessions),
        )

    @classmethod
    def load(cls, folder: str | os.PathLike, n_accessions: int) -> "AbundanceState":
        path = Path(folder) / STATE_FILENAME
        state = cls(n_accessions)
        if path.exists():
            z = np.load(path, allow_pickle=True)
            if int(z["n_accessions"]) == n_accessions:
                for name, row in zip(z["names"], z["counts"]):
                    state.samples[str(name)] = row.astype(np.int64)
        return state

    @staticmethod
    def clear(folder: str | os.PathLike) -> None:
        path = Path(folder) / STATE_FILENAME
        if path.exists():
            path.unlink()


def normalize(state: AbundanceState, genome_lengths: np.ndarray) -> dict[str, np.ndarray]:
    """BPB/BPM two-pass normalization (`aligner.py:305-319`).

    Returns per-sample float64 vectors; entries for absent accessions
    are 0 (exported as NaN/missing, matching the reference's sparse
    Counter semantics).
    """
    out = {}
    gl = np.maximum(genome_lengths.astype(np.float64), 1.0)
    for sample, counts in state.samples.items():
        bpb = counts.astype(np.float64) / gl
        total = bpb.sum()
        out[sample] = bpb / total if total > 0 else bpb
    return out


def to_dataframe(
    per_sample: dict[str, np.ndarray], meta: IndexMeta, overnight: bool = False
) -> pd.DataFrame:
    """Rows = MultiIndex (tax_unit, accession); columns = samples.

    Zero entries become NaN — in the reference a (tax_unit, accession)
    appears in a sample's Counter only if it received >=1 read, and
    missing cells surface as NaN after the unstack/concat
    (`aligner.py:322-325`).

    ``overnight`` collapses the tax_unit level to the genus (the first
    ``_``-separated token), matching the reference's overnight counting
    where ``sample_alignment`` is keyed by the genus-collapsed tax unit
    (`aligner.py:237-239,247-263`) — accessions stay distinct, so two
    species of one genus become two rows under one genus key, exactly
    the shape the reference's dict unstacks to.  Counting per accession
    and collapsing at export is equivalent to the reference's
    collapse-before-count because the accession->tax mapping is static.
    """
    samples = sorted(per_sample)
    rows_mask = np.zeros(meta.n_accessions, dtype=bool)
    for s in samples:
        rows_mask |= per_sample[s] != 0
    idx = np.nonzero(rows_mask)[0]

    def tax(i: int) -> str:
        t = meta.tax_units[i]
        return t.split("_")[0] if overnight else t

    index = pd.MultiIndex.from_arrays(
        [
            [tax(i) for i in idx],
            [meta.accessions[i] for i in idx],
        ],
        names=["tax_unit", "accession"],
    )
    data = {}
    for s in samples:
        col = per_sample[s][idx].astype(np.float64)
        data[s] = np.where(col != 0, col, np.nan)
    return pd.DataFrame(data, index=index)


def export_tables(
    state: AbundanceState,
    meta: IndexMeta,
    output_folder: str | os.PathLike,
    overnight: bool = False,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Write ``monica.dataframe`` (normalized) and ``raw_monica.dataframe``
    (raw counts) CSVs — the on-disk public API (`monica/monica.py:443-448`).
    ``overnight`` exports genus-collapsed tax units (see to_dataframe)."""
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    raw = to_dataframe(
        {s: c.astype(np.float64) for s, c in state.samples.items()}, meta,
        overnight=overnight,
    )
    norm = to_dataframe(normalize(state, meta.genome_lengths), meta, overnight=overnight)
    norm.to_csv(output_folder / DATAFRAME_FILENAME)
    raw.to_csv(output_folder / RAW_DATAFRAME_FILENAME)
    return norm, raw


def read_dataframe(path: str | os.PathLike) -> pd.DataFrame:
    """Read a monica dataframe CSV back (plot_only path, monica.py:784-785)."""
    return pd.read_csv(path, index_col=(0, 1))
