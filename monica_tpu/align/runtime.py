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
# quarantine for samples that fail to parse/classify: the watch loop
# must survive one bad flowcell file (the reference's per-sample thread
# at least confined the damage; here it is explicit and observable)
FAILED_DIR = "failed"

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
        self.mesh = mesh
        if mesh is None:
            if len(built.shards) == 1:
                # single-shard fast path: unstacked index through
                # classify_batch — no lax.map, no merge stage (measured
                # ~1.5x end-to-end on a 64 Mbase 1-shard index: a
                # 1-iteration lax.map pessimizes the XLA schedule)
                dev, steps = pl.device_shard(built.shards[0])
                self.index = dev
            else:
                # size-class grouped stacking: one skewed shard does not
                # pad the rest (pipeline.stack_device_shard_groups)
                groups, steps = pl.stack_device_shard_groups(built.shards)
                self.index = groups
            self.params = params._replace(
                tag_bits=steps, k=built.meta.k, w=built.meta.w, frac=built.meta.frac
            )
            self._step = None
        else:
            stacked, steps = pl.stack_device_shards(built.shards)
            self.params = params._replace(
                tag_bits=steps, k=built.meta.k, w=built.meta.w, frac=built.meta.frac
            )
            from monica_tpu.parallel import mesh as pm
            from monica_tpu.parallel import dist

            n_index = mesh.shape[pm.INDEX_AXIS]
            if len(built.shards) != n_index:
                raise ValueError(
                    f"index has {len(built.shards)} shards but mesh index axis is {n_index}"
                )
            self.index = pm.shard_index(mesh, stacked)
            self._steps = {}  # per-bucket-params sharded steps
            self._data_mult = mesh.shape[pm.DATA_AXIS]

    def _mesh_step(self, params):
        key = params.n_slots
        if key not in self._steps:
            from monica_tpu.parallel import dist

            self._steps[key] = dist.make_sharded_classifier(
                self.mesh, params, self.meta.n_accessions, self.count_mode
            )
        return self._steps[key]

    def classify(self, codes: np.ndarray, lengths: np.ndarray):
        """Dispatch one padded batch; returns device (ReadResult, counts)
        WITHOUT blocking (async dispatch = free double buffering)."""
        import jax.numpy as jnp

        params = pl.params_for_bucket(self.params, codes.shape[1])
        if self.mesh is None:
            # 2-bit packed wire format: host->device bandwidth is the
            # streaming bottleneck (STREAM_r03.json), so reads cross
            # the wire at 4 bases/byte and unpack on device inside the
            # jit program (fused into sketching).
            step = (
                pl.classify_batch_packed
                if isinstance(self.index, pl.DeviceIndexShard)
                else pl.classify_batch_grouped_packed
            )
            return step(
                self.index,
                jnp.asarray(enc.pack_codes_2bit(codes)),
                jnp.asarray(lengths),
                codes.shape[1],
                params,
                self.meta.n_accessions,
                self.count_mode,
            )
        from monica_tpu.parallel import mesh as pm

        dcodes, dlens = pm.shard_reads(self.mesh, codes, lengths)
        return self._mesh_step(params)(self.index, dcodes, dlens)

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
        batches = []
        for blen, rows in enc.window_plan(lengths, buckets, max_batch):
            r = np.asarray(rows, dtype=np.int64)  # (n, 3): idx, off, wlen
            codes = np.full((len(r), blen), enc.PAD_CODE, dtype=np.uint8)
            self.view.encode_rows(r[:, 0], codes, offsets=r[:, 1], window_lens=r[:, 2])
            batches.append(
                enc.ReadBatch(codes, r[:, 2].astype(np.int32), r[:, 0].astype(np.int32))
            )
        return batches

    def read_length(self, i: int) -> int:
        return int(self.view.seq_len[i])

    def write(self, fh, i: int, new_id: str | None = None):
        if new_id is None:
            fh.write(self.view.record_bytes(i))
        else:
            fh.write(self.view.record_with_id(i, new_id.encode()))

    def write_many(self, fh, indices, new_id: str | None = None):
        """Batched span write: one C concat + one fh.write for a whole
        route (replaces the per-read Python loop, VERDICT r2 item 7)."""
        if not len(indices):
            return
        if new_id is None:
            fh.write(self.view.concat_records(indices))
        else:
            fh.write(self.view.concat_records_with_id(indices, new_id.encode()))


class _PySample:
    """Fallback on the dependency-free Python parser."""

    def __init__(self, records):
        self.records = records
        self.binary = False

    def __len__(self):
        return len(self.records)

    def batches(self, buckets, max_batch):
        return enc.bucketize_reads([r.seq for r in self.records], buckets, max_batch)

    def read_length(self, i: int) -> int:
        return len(self.records[i].seq)

    def write(self, fh, i: int, new_id: str | None = None):
        seqio.write_fastq_record(fh, self.records[i], new_id=new_id)

    def write_many(self, fh, indices, new_id: str | None = None):
        for i in indices:
            seqio.write_fastq_record(fh, self.records[int(i)], new_id=new_id)


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
    # ultra-long reads arrive as several window rows sharing one idx
    # (enc.window_plan); collect their per-window results for the merge
    rows_per_read = np.zeros(len(sample), np.int64)
    for b, _ in pending:
        keep = b.idx >= 0
        np.add.at(rows_per_read, b.idx[keep], 1)
    chunked = rows_per_read > 1
    windows: dict[int, list[tuple[int, int, int, int]]] = {}
    with metrics.stage(f"classify:{name}", items=len(sample)):
        for b, (res, c) in pending:
            keep = b.idx >= 0
            idxs = b.idx[keep]
            # ONE packed device->host transfer per batch (each fetch is
            # a full round-trip regardless of size; see pl.pack_results)
            arr = np.asarray(pl.pack_results(res, c))
            st = arr[0][keep]
            ac = arr[1][keep]
            counts += arr[3:].reshape(-1)[: len(counts)].astype(np.int64)
            n_bases += int(b.lengths.sum())
            ch = chunked[idxs]
            status[idxs[~ch]] = st[~ch]
            acc[idxs[~ch]] = ac[~ch]
            if ch.any():
                ml = arr[2][keep]
                wl = b.lengths[keep]
                for i, s_, a_, m_, w_ in zip(
                    idxs[ch], st[ch], ac[ch], ml[ch], wl[ch]
                ):
                    windows.setdefault(int(i), []).append(
                        (int(s_), int(a_), int(m_), int(w_))
                    )
    metrics.add("bases", 0.0, n_bases)

    # chunk-and-merge verdicts (reference behavior: minimap2 maps the
    # full-length read, aligner.py:193): windows agreeing on one
    # accession -> MAPPED, mapped windows disagreeing -> AMBIGUOUS.
    # Device counts included each window separately; retract those and
    # add one whole-read contribution so count semantics match an
    # unchunked read of the same length.
    mode = classifier.count_mode
    for i, ws in windows.items():
        mapped_accs = {a for s_, a, _, _ in ws if s_ == pl.MAPPED}
        for s_, a, m, w in ws:
            if s_ == pl.MAPPED:
                counts[a] -= (
                    1 if mode == pl.MODE_BASIC
                    else w if mode == pl.MODE_QUERY_LENGTH else m
                )
        if len(mapped_accs) == 1:
            a = mapped_accs.pop()
            status[i] = pl.MAPPED
            acc[i] = a
            counts[a] += (
                1 if mode == pl.MODE_BASIC
                else sample.read_length(i) if mode == pl.MODE_QUERY_LENGTH
                else sum(m for s_, aa, m, _ in ws if s_ == pl.MAPPED and aa == a)
            )
        elif len(mapped_accs) > 1 or any(s_ == pl.AMBIGUOUS for s_, *_ in ws):
            status[i] = pl.AMBIGUOUS
        else:
            status[i] = pl.UNMAPPED

    state.update(name, counts)

    tax_units = classifier.meta.tax_units
    wmode = "ab" if sample.binary else "a"
    with metrics.stage(f"route:{name}", items=len(sample)):
        # status-sorted batched writes: one span-concat + one write per
        # route (and per accession on the mapped route, whose read ids
        # are rewritten to the tax unit) — no per-read Python loop.
        mapped_idx = np.where(status == pl.MAPPED)[0]
        amb_idx = np.where(status == pl.AMBIGUOUS)[0]
        unm_idx = np.where((status != pl.MAPPED) & (status != pl.AMBIGUOUS))[0]
        rep.n_mapped = len(mapped_idx)
        rep.n_ambiguous = len(amb_idx)
        rep.n_unmapped = len(unm_idx)
        with open(folders.unmapped / sample_path.name, wmode) as fh:
            sample.write_many(fh, unm_idx)
        with open(folders.ambiguous / sample_path.name, wmode) as fh:
            sample.write_many(fh, amb_idx)
        focus_sel: list[np.ndarray] = []
        with open(folders.mapped / sample_path.name, wmode) as fh:
            for a in np.unique(acc[mapped_idx]):
                sel = mapped_idx[acc[mapped_idx] == a]
                tax = tax_units[int(a)]
                if folders.focus is not None and tax in focus_taxa:
                    focus_sel.append(sel)
                if overnight:
                    # genus collapse (reference aligner.py:237-239)
                    tax = tax.split("_")[0]
                sample.write_many(fh, sel, new_id=tax)
        if folders.focus is not None:
            fsel = (
                np.sort(np.concatenate(focus_sel))
                if focus_sel
                else np.zeros(0, np.int64)
            )
            rep.n_focus = len(fsel)
            with open(folders.focus / sample_path.name, wmode) as fh:
                sample.write_many(fh, fsel)  # original ids (raw copy)

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
        try:
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
        except Exception as e:  # quarantine, keep the run alive
            failed = query_folder / FAILED_DIR
            failed.mkdir(parents=True, exist_ok=True)
            target = failed / s.name
            try:
                s.replace(target)
            except OSError:
                pass
            print(f"sample {s.name} failed ({e}); quarantined to {target}")
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
