"""Streaming classification runtime — the `multi_threaded_aligner` /
`aligner` / `alignment_update` orchestration layer re-designed around a
device-resident index.

Reference contract being reproduced (SURVEY.md §3.4, `monica/genomes/
aligner.py:65-302`):

* scan the query folder for non-empty ``*.fastq`` samples, consume and
  DELETE each after processing (idempotent re-invocation per batch);
* route every read to ``mapped/`` (id rewritten to its tax unit),
  ``unmapped/``, or ``ambiguous/`` FASTQs under the query folder, plus
  a copy to ``focus/`` when its tax unit is a focus species;
* count by mode (basic / query_length / matching) per (tax_unit,
  accession) and merge into the cross-batch accumulator in the output
  folder (``alignment.pkl`` -> :class:`AbundanceState`/alignment.npz);
* signal progress with empty sentinel files for external watchers.

What is deliberately different (TPU-first): there is no ``hits/``
partial-state folder — the reference needs it because each index chunk
is aligned in a separate pass over the sample file (`aligner.py:91-103,
184-203`); here every index shard is device-resident and per-shard hits
merge on device (one ``lax.map``/``all_gather``), so partial hits never
touch the filesystem.  Host->device feeding is double-buffered by jax's
async dispatch: batch i+1 is parsed/encoded while batch i computes.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import jax

from monica_tpu.align import pipeline as pl
from monica_tpu.index.build import BuiltIndex
from monica_tpu.io import encode as enc
from monica_tpu.io import seq as seqio
from monica_tpu.stats.abundance import AbundanceState
from monica_tpu.utils.metrics import Metrics

# routed-output folder names (reference aligner.py:24-28)
MAPPED_DIR = "mapped"
UNMAPPED_DIR = "unmapped"
AMBIGUOUS_DIR = "ambiguous"
FOCUS_DIR = "focus"

# sentinel files — the reference's file-IPC flags for external watchers
# (database.py:47, aligner.py:40,51, monica.py:424)
S_DATABASE_CREATED = "database_created"
S_ENTERED_INDEXER = "entered_indexer"
S_FINISHED_INDEXING = "finished_indexing"
S_GOING_TO_ALIGN = "going_to_enter_alignment"


def touch_sentinel(folder: str | os.PathLike, name: str) -> None:
    Path(folder).mkdir(parents=True, exist_ok=True)
    (Path(folder) / name).touch()


@dataclass
class RouteFolders:
    """Routed FASTQ output folders under the query folder."""

    mapped: Path
    unmapped: Path
    ambiguous: Path
    focus: Path | None

    @classmethod
    def create(cls, query_folder, with_focus: bool) -> "RouteFolders":
        q = Path(query_folder)
        f = cls(
            mapped=q / MAPPED_DIR,
            unmapped=q / UNMAPPED_DIR,
            ambiguous=q / AMBIGUOUS_DIR,
            focus=(q / FOCUS_DIR) if with_focus else None,
        )
        for d in (f.mapped, f.unmapped, f.ambiguous, f.focus):
            if d is not None:
                d.mkdir(parents=True, exist_ok=True)
        return f


class Classifier:
    """Device-resident index + jitted classification step.

    Single-process: all shards stacked on one device (or sharded over a
    mesh when one is given — see :mod:`monica_tpu.parallel.dist`).
    """

    def __init__(
        self,
        built: BuiltIndex,
        params: pl.ClassifyParams = pl.ClassifyParams(),
        count_mode: str = "query_length",
        mesh=None,
    ):
        self.meta = built.meta
        self.count_mode = pl.COUNT_MODES[count_mode]
        stacked, steps = pl.stack_device_shards(built.shards)
        self.params = params._replace(
            tag_bits=steps, k=built.meta.k, w=built.meta.w, frac=built.meta.frac
        )
        self.mesh = mesh
        if mesh is None:
            self.index = stacked
            self._step = None
        else:
            from monica_tpu.parallel import mesh as pm
            from monica_tpu.parallel import dist

            n_index = mesh.shape[pm.INDEX_AXIS]
            if len(built.shards) != n_index:
                raise ValueError(
                    f"index has {len(built.shards)} shards but mesh index axis is {n_index}"
                )
            self.index = pm.shard_index(mesh, stacked)
            self._step = dist.make_sharded_classifier(
                mesh, self.params, self.meta.n_accessions, self.count_mode
            )
            self._data_mult = mesh.shape[pm.DATA_AXIS]

    def classify(self, codes: np.ndarray, lengths: np.ndarray):
        """Dispatch one padded batch; returns device (ReadResult, counts)
        WITHOUT blocking (async dispatch = free double buffering)."""
        import jax.numpy as jnp

        if self.mesh is None:
            return pl.classify_batch_stacked(
                self.index,
                jnp.asarray(codes),
                jnp.asarray(lengths),
                self.params,
                self.meta.n_accessions,
                self.count_mode,
            )
        from monica_tpu.parallel import mesh as pm

        dcodes, dlens = pm.shard_reads(self.mesh, codes, lengths)
        return self._step(self.index, dcodes, dlens)

    def batch_row_multiple(self) -> int:
        return getattr(self, "_data_mult", 1)


@dataclass
class SampleReport:
    sample: str
    n_reads: int = 0
    n_mapped: int = 0
    n_unmapped: int = 0
    n_ambiguous: int = 0
    n_focus: int = 0
    seconds: float = 0.0


# ---------------------------------------------------------------------------
# sample adapters: native (C span-indexed buffer) and pure-Python
# ---------------------------------------------------------------------------

class _NativeSample:
    """Reads come from a span-indexed raw buffer (monica_tpu.io.native):
    encoding fills code matrices in C, routing writes raw record byte
    slices (id swapped in-place for the mapped route)."""

    def __init__(self, view):
        self.view = view
        self.binary = True

    def __len__(self):
        return len(self.view)

    def batches(self, buckets, max_batch):
        lengths = self.view.lengths.astype(np.int64)
        order = np.argsort(
            np.searchsorted(np.asarray(buckets), np.minimum(lengths, buckets[-1])),
            kind="stable",
        )
        batches = []
        i = 0
        while i < len(order):
            blen = int(enc.bucket_for_length(int(lengths[order[i]]), buckets))
            j = i
            while (
                j < len(order)
                and j - i < max_batch
                and enc.bucket_for_length(int(lengths[order[j]]), buckets) == blen
            ):
                j += 1
            idx = order[i:j]
            codes = np.full((len(idx), blen), enc.PAD_CODE, dtype=np.uint8)
            self.view.encode_rows(idx, codes)
            batches.append(
                enc.ReadBatch(
                    codes,
                    np.minimum(lengths[idx], blen).astype(np.int32),
                    idx.astype(np.int32),
                )
            )
            i = j
        return batches

    def write(self, fh, i: int, new_id: str | None = None):
        if new_id is None:
            fh.write(self.view.record_bytes(i))
        else:
            fh.write(self.view.record_with_id(i, new_id.encode()))


class _PySample:
    """Fallback on the dependency-free Python parser."""

    def __init__(self, records):
        self.records = records
        self.binary = False

    def __len__(self):
        return len(self.records)

    def batches(self, buckets, max_batch):
        return enc.bucketize_reads([r.seq for r in self.records], buckets, max_batch)

    def write(self, fh, i: int, new_id: str | None = None):
        seqio.write_fastq_record(fh, self.records[i], new_id=new_id)


def _load_sample(sample_path) -> "_NativeSample | _PySample":
    from monica_tpu.io import native

    if native.available():
        view = native.parse_fastq_file(sample_path)
        if view is not None:
            return _NativeSample(view)
    return _PySample(list(seqio.read_fastq(sample_path)))


def process_sample(
    classifier: Classifier,
    sample_path: str | os.PathLike,
    folders: RouteFolders,
    state: AbundanceState,
    focus_taxa: frozenset[str] = frozenset(),
    overnight: bool = False,
    buckets=enc.DEFAULT_BUCKETS,
    max_batch: int = 4096,
    delete: bool = True,
    metrics: Metrics | None = None,
) -> SampleReport:
    """Classify one sample file end-to-end and route its reads.

    The per-read loop of `aligner.py:205-265`, restructured: parse ->
    bucketized device batches (async dispatch) -> fetch -> host routing
    + count accumulation -> delete consumed file.
    """
    metrics = metrics or Metrics(verbose=False)
    t0 = time.perf_counter()
    sample_path = Path(sample_path)
    name = seqio.sample_name(sample_path)
    rep = SampleReport(sample=name)

    with metrics.stage(f"parse:{name}"):
        sample = _load_sample(sample_path)
    rep.n_reads = len(sample)
    if not len(sample):
        if delete:
            sample_path.unlink(missing_ok=True)
        return rep

    batches = sample.batches(buckets, max_batch)
    mult = classifier.batch_row_multiple()
    batches = [enc.pad_rows(b, mult) for b in batches]

    # dispatch everything first (device queue), then fetch in order —
    # host encode of batch i+1 overlaps device compute of batch i.
    pending = [(b, classifier.classify(b.codes, b.lengths)) for b in batches]

    status = np.zeros(len(sample), np.int32)
    acc = np.full(len(sample), -1, np.int32)
    counts = np.zeros(classifier.meta.n_accessions, np.int64)
    n_bases = 0
    with metrics.stage(f"classify:{name}", items=len(sample)):
        for b, (res, c) in pending:
            keep = b.idx >= 0
            status[b.idx[keep]] = np.asarray(res.status)[keep]
            acc[b.idx[keep]] = np.asarray(res.acc_id)[keep]
            counts += np.asarray(c).astype(np.int64)
            n_bases += int(b.lengths.sum())
    metrics.add("bases", 0.0, n_bases)

    state.update(name, counts)

    tax_units = classifier.meta.tax_units
    wmode = "ab" if sample.binary else "a"
    with metrics.stage(f"route:{name}", items=len(sample)):
        focus_fh = (
            open(folders.focus / sample_path.name, wmode) if folders.focus else None
        )
        with open(folders.mapped / sample_path.name, wmode) as mapped, open(
            folders.unmapped / sample_path.name, wmode
        ) as unmapped, open(folders.ambiguous / sample_path.name, wmode) as ambiguous:
            for i in range(len(sample)):
                st = status[i]
                if st == pl.MAPPED:
                    tax = tax_units[acc[i]]
                    if focus_fh is not None and tax in focus_taxa:
                        sample.write(focus_fh, i)
                        rep.n_focus += 1
                    if overnight:
                        # genus collapse (reference aligner.py:237-239)
                        tax = tax.split("_")[0]
                    sample.write(mapped, i, new_id=tax)
                    rep.n_mapped += 1
                elif st == pl.AMBIGUOUS:
                    sample.write(ambiguous, i)
                    rep.n_ambiguous += 1
                else:
                    sample.write(unmapped, i)
                    rep.n_unmapped += 1
        if focus_fh is not None:
            focus_fh.close()

    if delete:
        sample_path.unlink(missing_ok=True)
    rep.seconds = time.perf_counter() - t0
    return rep


def run_once(
    classifier: Classifier,
    query_folder: str | os.PathLike,
    output_folder: str | os.PathLike,
    focus_taxa: frozenset[str] = frozenset(),
    overnight: bool = False,
    delete: bool = True,
    metrics: Metrics | None = None,
    max_batch: int = 4096,
) -> list[SampleReport]:
    """One batch pass: process every sample currently in the folder and
    persist the accumulator (the re-invocation unit of SURVEY §3.4)."""
    query_folder = Path(query_folder)
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    samples = seqio.list_sample_files(query_folder)
    if not samples:
        return []
    touch_sentinel(query_folder, S_GOING_TO_ALIGN)
    folders = RouteFolders.create(query_folder, with_focus=bool(focus_taxa))
    state = AbundanceState.load(output_folder, classifier.meta.n_accessions)
    reports = []
    for s in samples:
        reports.append(
            process_sample(
                classifier,
                s,
                folders,
                state,
                focus_taxa=focus_taxa,
                overnight=overnight,
                delete=delete,
                metrics=metrics,
                max_batch=max_batch,
            )
        )
    state.save(output_folder)
    return reports


def watch(
    classifier: Classifier,
    query_folder,
    output_folder,
    poll_s: float = 5.0,
    max_idle_polls: int | None = None,
    on_batch=None,
    **kwargs,
) -> list[SampleReport]:
    """Real-time loop: the reference relies on an external watcher
    re-invoking the CLI per flowcell batch; here the loop is first-class.
    ``on_batch(reports)`` runs after each non-empty pass (e.g. table
    export + plot refresh).  Stops after ``max_idle_polls`` empty polls
    (None = run forever)."""
    all_reports: list[SampleReport] = []
    idle = 0
    while True:
        reports = run_once(classifier, query_folder, output_folder, **kwargs)
        if reports:
            idle = 0
            all_reports.extend(reports)
            if on_batch is not None:
                on_batch(reports)
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return all_reports
            time.sleep(poll_s)
