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
        if self.count_mode == pl.MODE_MATCHING and params.extend:
            # 'matching' counts the reference's alignment mlen
            # (`aligner.py:195,258-260` reads mappy's hit.mlen) — the
            # default budgeted-rescue mode leaves vote-passed reads with
            # only the statistical mlen estimate, so matching mode runs
            # extension on EVERY read to count true matching bases
            params = params._replace(extend_mode="full")
        self.mesh = mesh
        if mesh is None:
            if len(built.shards) == 1:
                # single-shard fast path: unstacked index through
                # classify_batch — no lax.map, no merge stage (measured
                # ~1.5x end-to-end on a 64 Mbase 1-shard index: a
                # 1-iteration lax.map pessimizes the XLA schedule)
                if built.device:
                    # TPU-resident build: the hash table already lives
                    # on device (index/build._device_hash_table); only
                    # pos_acc/ref_codes upload (H2D is the fast
                    # direction) — no minimizer D2H, no host rebuild
                    import jax.numpy as jnp

                    table, steps = built.device[0]
                    sh = built.shards[0]
                    dev = pl.DeviceIndexShard(
                        mz_rows=table,
                        pos_acc=jnp.asarray(sh.pos_accession_id),
                        ref_codes=jnp.asarray(sh.ref_codes),
                    )
                else:
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
            from monica_tpu.parallel import mesh as pm

            n_index = mesh.shape[pm.INDEX_AXIS]
            # any shard count works: several shards per index rank are
            # stacked rank-major by size class and lax.mapped inside
            # the sharded step (the reference aligns every read against
            # every chunk however many there are, aligner.py:91-103)
            groups, steps = pl.stack_mesh_shard_groups(built.shards, n_index)
            self.params = params._replace(
                tag_bits=steps, k=built.meta.k, w=built.meta.w, frac=built.meta.frac
            )
            self.index = tuple(pm.shard_index(mesh, g) for g in groups)
            self._steps = {}  # per-bucket-params sharded steps
            self._data_mult = mesh.shape[pm.DATA_AXIS]

    def _mesh_step(self, params):
        # key on the WHOLE params tuple: today only n_slots varies per
        # bucket, but keying on it alone would silently reuse a stale
        # step the first time params_for_bucket varies anything else
        key = params
        if key not in self._steps:
            from monica_tpu.parallel import dist

            self._steps[key] = dist.make_sharded_classifier(
                self.mesh, params, self.meta.n_accessions, self.count_mode,
                index_tree=self.index,
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

    def fetch(self, res, counts):
        """Blocking device->host fetch of one dispatched batch's results
        for THIS process's rows: (status, acc_id, mlen, counts) numpy
        arrays, counts already reduced to one (n_accessions,) int64
        vector covering this process's rows only.

        Single-process: one packed transfer (pl.pack_results).
        Multi-process: the global result is not fully addressable —
        fetch this process's addressable row blocks per field
        (parallel.mesh.fetch_local_rows) and sum its data ranks'
        count rows."""
        import jax

        if self.mesh is not None and jax.process_count() > 1:
            from monica_tpu.parallel import mesh as pm

            st = pm.fetch_local_rows(res.status)
            ac = pm.fetch_local_rows(res.acc_id)
            ml = pm.fetch_local_rows(res.mlen)
            c = pm.fetch_local_rows(counts).sum(axis=0).astype(np.int64)
            return st, ac, ml, c
        return self._split_packed(np.asarray(pl.pack_results(res, counts)))

    def _split_packed(self, arr: np.ndarray):
        """(status, acc_id, mlen, counts) from a pl.pack_results array."""
        n_acc = self.meta.n_accessions
        flat = arr[3:].reshape(-1)
        if self.mesh is not None:
            c = (
                flat[: self._data_mult * n_acc]
                .reshape(self._data_mult, n_acc)
                .sum(axis=0)
                .astype(np.int64)
            )
        else:
            c = flat[:n_acc].astype(np.int64)
        return arr[0], arr[1], arr[2], c

    def dispatch_pack(self, res, counts):
        """Dispatch-side device packing (non-blocking: the pack program
        joins the async dispatch queue right behind its batch's
        classify program).  Multi-process results are not fully
        addressable — passed through untouched for the per-field fetch
        path.

        Note: ``copy_to_host_async`` is deliberately NOT used — on the
        tunneled backend it synchronizes (measured: 0.28 s -> 13.2 s
        dispatch for 25 batches).  Cross-batch aggregation happens in
        :meth:`combine_packed` instead."""
        import jax

        if self.mesh is not None and jax.process_count() > 1:
            return (res, counts)
        return pl.pack_results(res, counts)

    def combine_packed(self, handles: list):
        """One device-side concat of a whole sample's packed batch
        results -> ONE host transfer for the sample (pl.concat_packed).
        Returns None when results must be fetched per-field
        (multi-process mesh) or there is nothing to combine."""
        if len(handles) < 2 or any(isinstance(h, tuple) for h in handles):
            return None
        return pl.concat_packed(tuple(handles))

    def fetch_packed(self, handle):
        """Blocking counterpart of dispatch_pack."""
        if isinstance(handle, tuple):
            return self.fetch(*handle)
        return self._split_packed(np.asarray(handle))

    def split_combined(self, combined, handles: list) -> list:
        """Fetch a combine_packed vector (one transfer) and split it
        back into per-batch (status, acc_id, mlen, counts) tuples."""
        flat = np.asarray(combined)
        out = []
        o = 0
        for h in handles:
            n = int(np.prod(h.shape))
            out.append(self._split_packed(flat[o : o + n].reshape(h.shape)))
            o += n
        return out

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
# multi-host lockstep (jax.distributed product path)
# ---------------------------------------------------------------------------
#
# When the mesh spans processes, every dispatch of the sharded step is a
# collective program: all processes must issue the same sequence of
# batch SHAPES or the run deadlocks.  Each host classifies its OWN
# sample files (the per-host contract: separate -q folders, per-host
# output tables whose union is the global result — "linear to N hosts"
# means host-granular data parallelism over flowcells, with the mesh
# collectives only merging index shards / read rows *within* one
# dispatch).  Shape agreement is reached with one small
# process_allgather per sample: the per-bucket batch-row schedule is
# maxed across processes and every host pads its batches (adding inert
# all-padding rows/batches) to the common schedule.

def _is_multiprocess(classifier: "Classifier") -> bool:
    if classifier.mesh is None:
        return False
    import jax

    return jax.process_count() > 1


_MAX_SCHED_SLOTS = 512  # batches per sample in the allgathered plan


def _sync_batch_schedule(batches: list) -> list:
    """Agree on a common dispatch schedule across processes and return
    this process's (padded/extended) lockstep batch list.

    Local plans are encoded as (bucket_len, padded_rows) pairs; the
    global schedule takes, per bucket, the slot-wise maximum row count
    over processes (each process orders its per-bucket batches by
    descending rows first, so maxima pair like with like).  A process
    missing a scheduled slot contributes an all-padding batch — inert
    rows (length 0, idx -1) that the pipeline masks out."""
    from jax.experimental import multihost_utils

    per: dict[int, list] = {}
    for b in batches:
        per.setdefault(b.bucket_len, []).append(b)
    for v in per.values():
        v.sort(key=len, reverse=True)

    # one extra row carries this process's overflow flag: a host whose
    # sample needs more than _MAX_SCHED_SLOTS batches must NOT raise
    # before the allgather (its peers would hang in the collective and
    # die by heartbeat timeout, ADVICE r4) — every process gathers the
    # flags first and then raises the same error TOGETHER.
    plan = np.zeros((_MAX_SCHED_SLOTS + 1, 2), np.int32)
    i = 0
    overflow = 0
    for blen in sorted(per):
        for b in per[blen]:
            if i >= _MAX_SCHED_SLOTS:
                overflow += 1
                continue
            plan[i] = (blen, len(b))
            i += 1
    plan[_MAX_SCHED_SLOTS] = (-1, overflow)
    all_plans = np.asarray(multihost_utils.process_allgather(plan))
    if all_plans.ndim == 2:  # single process (allgather is a no-op)
        all_plans = all_plans[None]
    total_overflow = int(
        all_plans[:, _MAX_SCHED_SLOTS, 1].astype(np.int64).sum()
    )
    if total_overflow:
        raise ValueError(
            f"a sample needs >{_MAX_SCHED_SLOTS} device batches "
            f"({total_overflow} over, across all hosts); raise --max_batch"
        )

    sched: dict[int, list[int]] = {}
    for p in range(all_plans.shape[0]):
        per_p: dict[int, list[int]] = {}
        for blen, rows in all_plans[p, :_MAX_SCHED_SLOTS]:
            if blen > 0:
                per_p.setdefault(int(blen), []).append(int(rows))
        for blen, lst in per_p.items():
            lst.sort(reverse=True)
            cur = sched.setdefault(blen, [])
            for k, r in enumerate(lst):
                if k < len(cur):
                    cur[k] = max(cur[k], r)
                else:
                    cur.append(r)

    out = []
    for blen in sorted(sched):
        have = per.get(blen, [])
        for k, rows in enumerate(sched[blen]):
            b = (
                have[k]
                if k < len(have)
                else enc.ReadBatch(
                    np.zeros((0, blen), np.uint8),
                    np.zeros(0, np.int32),
                    np.zeros(0, np.int32),
                )
            )
            out.append(enc.pad_rows(b, target=rows))
    return out


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


# whole-file ingest above this size switches to bounded-chunk streaming
# (VERDICT r4 missing #5: RSS must stay O(chunk), not O(file) — the
# reference streams records one at a time via SeqIO, aligner.py:191)
MAX_RESIDENT_BYTES = 256 << 20
CHUNK_BYTES = 64 << 20


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
    max_resident_bytes: int | None = None,  # None -> MAX_RESIDENT_BYTES
    chunk_bytes: int | None = None,  # None -> CHUNK_BYTES (call-time)
) -> SampleReport:
    """Classify one sample file end-to-end and route its reads.

    The per-read loop of `aligner.py:205-265`, restructured: parse ->
    bucketized device batches (async dispatch) -> fetch -> host routing
    + count accumulation -> delete consumed file.  run_once overlaps
    these stages ACROSS samples on worker threads (the reference's
    ThreadPool-over-samples analog, `aligner.py:89`); this function is
    the serial composition of the same three stages.

    ``sample_path=None`` is the multi-host lockstep filler: a host with
    fewer samples this pass still participates in every collective
    dispatch (all-padding batches), touching no files and no state.
    """
    metrics = metrics or Metrics(verbose=False)
    if max_resident_bytes is None:
        max_resident_bytes = MAX_RESIDENT_BYTES
    if chunk_bytes is None:
        chunk_bytes = CHUNK_BYTES
    t0 = time.perf_counter()
    multiproc = _is_multiprocess(classifier)
    if sample_path is not None and not multiproc:
        sz = Path(sample_path).stat().st_size
        # gzipped FASTQ expands ~4-8x: compare the ESTIMATED
        # decompressed size against the residency budget, else a
        # 200 MB .gz ballooning to >1 GB takes the whole-file path
        if str(sample_path).endswith(".gz"):
            sz *= 6
    else:
        sz = 0
    if sz > max_resident_bytes:
        from monica_tpu.io import native

        if native.available():
            # memory-bounded streaming: parse -> classify -> route one
            # bounded chunk at a time; the monotone accumulator makes
            # per-chunk updates equivalent to one whole-file update.
            # (Multi-host keeps whole-file parse: the lockstep batch
            # schedule is agreed per sample, not per chunk.)
            return _process_sample_chunked(
                classifier, Path(sample_path), folders, state,
                focus_taxa, overnight, buckets, max_batch, delete,
                metrics, t0, chunk_bytes,
            )
    prepared = _prepare_sample(classifier, sample_path, buckets, max_batch, metrics)
    if not prepared.n_rows and not multiproc:
        if delete and sample_path is not None:
            Path(sample_path).unlink(missing_ok=True)
        return prepared.rep
    pending = _dispatch_sample(classifier, prepared, multiproc)
    return _finish_sample(
        classifier, prepared, pending, folders, state,
        focus_taxa=focus_taxa, overnight=overnight, delete=delete,
        metrics=metrics, t0=t0,
    )


def _process_sample_chunked(
    classifier, sample_path: Path, folders, state, focus_taxa, overnight,
    buckets, max_batch, delete, metrics, t0, chunk_bytes,
) -> SampleReport:
    """Bounded-memory variant of process_sample: each ~chunk_bytes
    slice of the file runs the full parse -> dispatch -> fetch -> route
    cycle and is then dropped, so max RSS ~ 2x chunk + one chunk's
    encoded batches regardless of file size.  Routed outputs append, the
    accumulator is monotone, and records never split across chunks
    (io.native.iter_fastq_file_views), so results are identical to the
    whole-file parse (tested in tests/test_chunked_ingest.py)."""
    from monica_tpu.io import native

    name = seqio.sample_name(sample_path)
    total = SampleReport(sample=name)
    mult = classifier.batch_row_multiple()
    for view in native.iter_fastq_file_views(sample_path, chunk_bytes):
        sample = _NativeSample(view)
        with metrics.stage(f"encode:{name}"):
            batches = [
                enc.pad_rows(b, mult)
                for b in sample.batches(buckets, max_batch)
            ]
        prepared = _PreparedSample(
            sample_path, name, sample, batches, SampleReport(sample=name)
        )
        prepared.rep.n_reads = len(sample)
        pending = _dispatch_sample(classifier, prepared, False)
        rep = _finish_sample(
            classifier, prepared, pending, folders, state,
            focus_taxa=focus_taxa, overnight=overnight, delete=False,
            metrics=metrics, t0=time.perf_counter(),
        )
        total.n_reads += rep.n_reads
        total.n_mapped += rep.n_mapped
        total.n_unmapped += rep.n_unmapped
        total.n_ambiguous += rep.n_ambiguous
        total.n_focus += rep.n_focus
    if delete:
        sample_path.unlink(missing_ok=True)
    total.seconds = time.perf_counter() - t0
    return total


@dataclass
class _PreparedSample:
    """Host stage 1 output: parsed + encoded, ready for dispatch."""

    sample_path: Path | None
    name: str
    sample: object
    batches: list
    rep: SampleReport

    @property
    def n_rows(self) -> int:
        return len(self.sample)


def _prepare_sample(
    classifier, sample_path, buckets, max_batch, metrics
) -> _PreparedSample:
    """Parse + encode + bucketize one sample (C parser releases the
    GIL, so this overlaps other samples' device work in run_once)."""
    if sample_path is None:
        return _PreparedSample(
            None, "<lockstep-filler>", _PySample([]), [],
            SampleReport(sample="<lockstep-filler>"),
        )
    sample_path = Path(sample_path)
    name = seqio.sample_name(sample_path)
    rep = SampleReport(sample=name)
    with metrics.stage(f"parse:{name}"):
        sample = _load_sample(sample_path)
    rep.n_reads = len(sample)
    batches = []
    if len(sample):
        batches = sample.batches(buckets, max_batch)
        mult = classifier.batch_row_multiple()
        batches = [enc.pad_rows(b, mult) for b in batches]
    return _PreparedSample(sample_path, name, sample, batches, rep)


@dataclass
class _Dispatched:
    """In-flight device work for one sample: per-batch packed handles
    plus (single-process) the whole sample's combined result vector."""

    pending: list  # [(ReadBatch, handle)]
    combined: object | None  # pl.concat_packed output or None


def _dispatch_sample(
    classifier, prepared: _PreparedSample, multiproc: bool
) -> _Dispatched:
    """Dispatch every batch to the device queue WITHOUT blocking (jax
    async dispatch = free double buffering within the sample).  Each
    batch's result is packed on device (Classifier.dispatch_pack) and
    the whole sample's packed results are concatenated on device
    (Classifier.combine_packed), so the later fetch is ONE device->host
    transfer per sample instead of one round-trip per batch."""
    batches = prepared.batches
    if multiproc:
        # collective-program shape agreement (see module comment above
        # _sync_batch_schedule); every host dispatches the same shapes
        batches = _sync_batch_schedule(batches)
    pending = [
        (b, classifier.dispatch_pack(*classifier.classify(b.codes, b.lengths)))
        for b in batches
    ]
    return _Dispatched(
        pending, classifier.combine_packed([h for _, h in pending])
    )


def _finish_sample(
    classifier,
    prepared: _PreparedSample,
    pending,
    folders,
    state,
    focus_taxa=frozenset(),
    overnight=False,
    delete=True,
    metrics=None,
    t0=None,
    state_lock=None,
) -> SampleReport:
    """Fetch + window-merge + count + route + delete (host stage 3)."""
    metrics = metrics or Metrics(verbose=False)
    t0 = t0 if t0 is not None else time.perf_counter()
    sample = prepared.sample
    sample_path = prepared.sample_path
    name = prepared.name
    rep = prepared.rep

    status = np.zeros(len(sample), np.int32)
    acc = np.full(len(sample), -1, np.int32)
    counts = np.zeros(classifier.meta.n_accessions, np.int64)
    n_bases = 0
    # ultra-long reads arrive as several window rows sharing one idx
    # (enc.window_plan); collect their per-window results for the merge
    rows_per_read = np.zeros(len(sample), np.int64)
    for b, _ in pending.pending:
        keep = b.idx >= 0
        np.add.at(rows_per_read, b.idx[keep], 1)
    chunked = rows_per_read > 1
    windows: dict[int, list[tuple[int, int, int, int]]] = {}
    with metrics.stage(f"classify:{name}", items=len(sample)):
        # ONE device->host transfer for the whole sample when the
        # combined vector exists (Classifier.combine_packed); per-batch
        # packed fetches otherwise (single batch, or per-process
        # addressable rows under jax.distributed)
        if pending.combined is not None:
            fetched = classifier.split_combined(
                pending.combined, [h for _, h in pending.pending]
            )
        else:
            fetched = None
        for bi, (b, handle) in enumerate(pending.pending):
            keep = b.idx >= 0
            idxs = b.idx[keep]
            st_all, ac_all, ml_all, cb = (
                fetched[bi] if fetched is not None
                else classifier.fetch_packed(handle)
            )
            st = st_all[keep]
            ac = ac_all[keep]
            counts += cb
            n_bases += int(b.lengths.sum())
            ch = chunked[idxs]
            status[idxs[~ch]] = st[~ch]
            acc[idxs[~ch]] = ac[~ch]
            if ch.any():
                ml = ml_all[keep]
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

    if sample_path is None:
        rep.seconds = time.perf_counter() - t0
        return rep  # filler: no files to route, nothing to accumulate

    if state_lock is not None:
        with state_lock:
            state.update(name, counts)
    else:
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
    persist the accumulator (the re-invocation unit of SURVEY §3.4).

    Multi-host (`jax.distributed` + a process-spanning mesh): each host
    passes its OWN query/output folders and processes its own samples;
    hosts agree on the pass's sample count (hosts with fewer run inert
    lockstep fillers) so every collective dispatch lines up.  The
    per-host output tables' union is the global result.
    """
    query_folder = Path(query_folder)
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    samples: list = list(seqio.list_sample_files(query_folder))
    multiproc = _is_multiprocess(classifier)
    if multiproc:
        from jax.experimental import multihost_utils

        n_all = np.asarray(
            multihost_utils.process_allgather(np.int32(len(samples)))
        ).reshape(-1)
        samples += [None] * (int(n_all.max()) - len(samples))
    if not samples:
        return []
    touch_sentinel(query_folder, S_GOING_TO_ALIGN)
    folders = RouteFolders.create(query_folder, with_focus=bool(focus_taxa))
    state = AbundanceState.load(output_folder, classifier.meta.n_accessions)
    reports = []
    try:
        reports = _run_once_samples(
            classifier, samples, folders, state, query_folder, multiproc,
            focus_taxa, overnight, delete, metrics, max_batch,
        )
    finally:
        # counts accumulated before a mid-pass failure belong to
        # already-consumed (deleted) inputs — always persist them
        state.save(output_folder)
    return reports


def _run_once_samples(
    classifier, samples, folders, state, query_folder, multiproc,
    focus_taxa, overnight, delete, metrics, max_batch,
) -> list[SampleReport]:
    if not multiproc and len(samples) > 1:
        # single-process multi-sample: overlap host stages across
        # samples (parse i+1 / route i-1 on workers while the device
        # runs i — the reference's ThreadPool over samples analog).
        # Oversized files take the bounded-memory chunked path via
        # process_sample instead (the pipelined parse is whole-file;
        # routing a multi-GB flowcell through it would defeat the
        # O(chunk) RSS bound) — they run serially after the pipeline.
        def oversized(p) -> bool:
            sz = Path(p).stat().st_size
            if str(p).endswith(".gz"):
                sz *= 6  # estimated decompressed (see process_sample)
            return sz > MAX_RESIDENT_BYTES

        big = [s for s in samples if oversized(s)]
        small = [s for s in samples if s not in big]
        reports: list[SampleReport] = []
        if len(small) > 1:
            reports += _run_pipelined(
                classifier, small, folders, state, query_folder,
                focus_taxa, overnight, delete,
                metrics or Metrics(verbose=False), max_batch,
            )
            small = []
        for s in small + big:
            try:
                reports.append(
                    process_sample(
                        classifier, s, folders, state,
                        focus_taxa=focus_taxa, overnight=overnight,
                        delete=delete, metrics=metrics,
                        max_batch=max_batch,
                    )
                )
            except Exception as e:
                _quarantine_sample(query_folder, s, e)
        return reports
    reports: list[SampleReport] = []
    mt = metrics or Metrics(verbose=False)
    for s in samples:
        if multiproc:
            # Only the PRE-COLLECTIVE stage (parse/encode) may be
            # quarantined: substituting an inert filler for a failed
            # parse keeps every host's collective sequence aligned.  A
            # failure AFTER dispatch (routing I/O, device error) is NOT
            # recoverable per-sample — collectives for this slot are
            # already in flight on the peers, and injecting extra ones
            # would desynchronize the pod — so it propagates (the run
            # dies loudly rather than deadlocking every host).
            try:
                prepared = _prepare_sample(
                    classifier, s, enc.DEFAULT_BUCKETS, max_batch, mt
                )
            except Exception as e:
                _quarantine_sample(query_folder, s, e)
                prepared = _prepare_sample(
                    classifier, None, enc.DEFAULT_BUCKETS, max_batch, mt
                )
            t0 = time.perf_counter()
            pending = _dispatch_sample(classifier, prepared, True)
            rep = _finish_sample(
                classifier, prepared, pending, folders, state,
                focus_taxa=focus_taxa, overnight=overnight, delete=delete,
                metrics=mt, t0=t0,
            )
            if prepared.sample_path is not None:
                reports.append(rep)
            continue
        try:
            rep = process_sample(
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
            reports.append(rep)
        except Exception as e:  # quarantine, keep the run alive
            _quarantine_sample(query_folder, s, e)
    return reports


def _quarantine_sample(query_folder: Path, s, e: BaseException) -> None:
    failed = query_folder / FAILED_DIR
    failed.mkdir(parents=True, exist_ok=True)
    target = failed / s.name
    try:
        s.replace(target)
    except OSError:
        pass
    print(f"sample {s.name} failed ({e}); quarantined to {target}")


def _run_pipelined(
    classifier,
    samples,
    folders,
    state,
    query_folder: Path,
    focus_taxa,
    overnight,
    delete,
    metrics: Metrics,
    max_batch: int,
) -> list[SampleReport]:
    """Overlapped streaming (VERDICT r3 item 4): a 3-stage software
    pipeline over samples — parse/encode on a worker (the C parser
    releases the GIL), dispatch serially on the caller thread (bounds
    in-flight device work to ~2 samples' batches), fetch+route on a
    second worker (fetch blocks on the device; routing is span-concat
    + file writes).  Per-sample Metrics stage names are unique, and the
    shared AbundanceState is updated under a lock, so worker threads
    never contend on the same mutable record."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    state_lock = threading.Lock()
    reports: list[SampleReport] = []

    def quarantine(path: Path, e: BaseException) -> None:
        failed = query_folder / FAILED_DIR
        failed.mkdir(parents=True, exist_ok=True)
        target = failed / path.name
        try:
            path.replace(target)
        except OSError:
            pass
        print(f"sample {path.name} failed ({e}); quarantined to {target}")

    PREFETCH = 2
    MAX_IN_FLIGHT = 2  # samples dispatched but not yet routed
    # pool sizing: two workers per stage measured best even on the
    # 2-core bench host (1/1 pipelined ~35k reads/s, 2/2 58-99k, 3/3
    # worse again): the workers spend most of their time blocked in
    # C-parser / device-fetch / file-write calls that release the GIL,
    # so two per stage keeps a runnable thread behind every blocker
    # without oversubscription thrash.
    with ThreadPoolExecutor(max_workers=2) as parse_pool, ThreadPoolExecutor(
        max_workers=2
    ) as route_pool:
        parse_futs = [
            parse_pool.submit(
                _prepare_sample, classifier, s, enc.DEFAULT_BUCKETS,
                max_batch, metrics,
            )
            for s in samples[:PREFETCH]
        ]
        route_futs: list = []

        def drain_oldest():
            s_done, f_done = route_futs.pop(0)
            try:
                reports.append(f_done.result())
            except Exception as e:
                quarantine(Path(s_done), e)

        for i, s in enumerate(samples):
            try:
                prepared = parse_futs[i].result()
            except Exception as e:
                quarantine(Path(s), e)
                prepared = None
            nxt = i + PREFETCH
            if nxt < len(samples):
                parse_futs.append(
                    parse_pool.submit(
                        _prepare_sample, classifier, samples[nxt],
                        enc.DEFAULT_BUCKETS, max_batch, metrics,
                    )
                )
            if prepared is None:
                continue
            if not prepared.n_rows:
                if delete:
                    prepared.sample_path.unlink(missing_ok=True)
                reports.append(prepared.rep)
                continue
            # backpressure: keep at most MAX_IN_FLIGHT samples between
            # dispatch and route, so a long folder backlog does not
            # accumulate every sample's batches + device handles in
            # memory (the claimed ~2-sample bound, made real; 3-deep
            # was measured SLOWER on this host — extra concurrent
            # route/fetch threads contend on the tunnel and the GIL)
            while len(route_futs) >= MAX_IN_FLIGHT:
                drain_oldest()
            t0 = time.perf_counter()
            try:
                pending = _dispatch_sample(classifier, prepared, False)
            except Exception as e:  # bad batch shapes, device errors
                quarantine(Path(s), e)
                continue
            route_futs.append(
                (
                    s,
                    route_pool.submit(
                        _finish_sample, classifier, prepared, pending,
                        folders, state, focus_taxa, overnight, delete,
                        metrics, t0, state_lock,
                    ),
                )
            )
        while route_futs:
            drain_oldest()
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
    (None = run forever).

    Multi-host: run_once is a collective whenever ANY host has samples,
    so every host must keep calling it at the same cadence.  The idle
    counter is therefore SYNCHRONIZED across hosts (a pass counts as
    non-idle if ANY host got samples), so all hosts reach
    ``max_idle_polls`` — and exit — together instead of one host
    leaving the others hung on a collective."""
    all_reports: list[SampleReport] = []
    multiproc = _is_multiprocess(classifier)
    idle = 0
    while True:
        reports = run_once(classifier, query_folder, output_folder, **kwargs)
        any_got = bool(reports)
        if multiproc:
            from jax.experimental import multihost_utils

            any_got = bool(
                np.asarray(
                    multihost_utils.process_allgather(np.int32(any_got))
                ).max()
            )
        if reports:
            all_reports.extend(reports)
            if on_batch is not None:
                on_batch(reports)
        if any_got:
            idle = 0
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return all_reports
            time.sleep(poll_s)
