"""End-to-end orchestration: fetch -> build/cache index groups ->
classify -> normalize -> plot -> focus second pass.

This is the `main_after_seq`/`main_build_index` logic of the reference
(`monica/monica.py:129-741`) re-designed around explicit artifacts:

* guests (G_), per-host (H_) and focus (F_) index groups are cached
  under ``<root>/indexes/<group_string>`` with a manifest, rebuilt only
  when the genome set changed (``updated`` from the fetcher) — the
  reference's config-encoded folder caching (`monica.py:244-303`)
  without round-tripping configuration through folder names;
* groups merge structurally into one device-resident classifier
  (:func:`monica_tpu.index.build.merge_built`) instead of aligning
  each sample against every ``.mmi`` file sequentially;
* the focus pass re-classifies ``<query>/focus`` against the strain-
  level F_ index into ``<output>/focus`` (`monica.py:455-479`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path

from monica_tpu.align import pipeline as pl
from monica_tpu.align import runtime as rt
from monica_tpu.data import fetcher as gfetcher
from monica_tpu.data import tables as gtables
from monica_tpu.data.taxonomy import Taxonomy
from monica_tpu.index import artifact
from monica_tpu.index.build import BuiltIndex, build_index, merge_built
from monica_tpu.plots import barplot
from monica_tpu.stats.abundance import AbundanceState, export_tables
from monica_tpu.utils import root as rootutil
from monica_tpu.utils.metrics import Metrics


@dataclass
class DataContext:
    """Bundles everything the fetch layer needs; transports injectable
    so tests and air-gapped deployments run fully offline."""

    root: Path
    taxonomy: Taxonomy
    downloader: gtables.Downloader = gtables.urllib_downloader
    genome_downloader: gtables.Downloader | None = None
    genomes_dir_override: Path | None = None  # -g/--genomes_folder

    @property
    def tables_dir(self) -> Path:
        return rootutil.tables_dir(self.root)

    @property
    def genomes_dir(self) -> Path:
        if self.genomes_dir_override is not None:
            return Path(self.genomes_dir_override)
        return rootutil.genomes_dir(self.root)

    def gdl(self) -> gtables.Downloader:
        return self.genome_downloader or self.downloader


def expand_species_args(values: list[str] | None) -> list[str]:
    """Species CLI values may be files listing one taxon per line
    (reference monica.py:233-240)."""
    names: list[str] = []
    for v in values or []:
        if os.path.exists(v):
            names += [l for l in open(v).read().splitlines() if l.strip()]
        else:
            names.append(v)
    return names


def group_string(
    prefix: str, species: list[str], mode: str, n_shards: int, k: int, w: int,
    frac: float = 1.0,
) -> str:
    """Cache key for an index group — the G_/H_/F_ naming convention
    kept human-readable, with build params explicit."""
    fs = "" if frac == 1.0 else f"f{frac:g}"
    return f"{prefix}_{'_'.join(species)}_m_{mode}_k{k}w{w}s{n_shards}{fs}"


def _display_names(species: list[str]) -> list[str]:
    return [" ".join(s.split("_")) for s in species]


def resolve_group_index(
    ctx: DataContext,
    prefix: str,
    species: list[str],
    mode: str,
    n_shards: int,
    k: int,
    w: int,
    max_shard_bytes: int | None = None,
    extra_index_dirs: list[str] | None = None,
    format_genomes=None,
    keep_genomes: bool = True,
    fetch_mode: str | None = None,
    metrics: Metrics | None = None,
    frac: float = 1.0,
) -> BuiltIndex | None:
    """Fetch genomes for one species group and return its (possibly
    cached) built index, rebuilding when the genome set updated."""
    if not species:
        return None
    metrics = metrics or Metrics(verbose=False)
    gs = group_string(prefix, species, mode, n_shards, k, w, frac)
    idir = rootutil.indexes_dir(ctx.root)

    # cache resolution order: explicit dirs > outside registry > inside
    candidates = []
    for d in extra_index_dirs or []:
        if Path(d).name == gs:
            candidates.append(Path(d))
    candidates += [p for p in artifact.list_indexes(idir, ctx.root) if p.name == gs]

    with metrics.stage(f"fetch:{gs}"):
        table = gfetcher.ftp_selector(
            fetch_mode or mode, _display_names(species), ctx.taxonomy,
            ctx.tables_dir, ctx.downloader,
        )
        if prefix == "F":
            genomes, updated = gfetcher.focus_fetcher(
                table, ctx.genomes_dir, keep_genomes=keep_genomes,
                downloader=ctx.gdl(),
            )
        else:
            genomes, updated = gfetcher.fetcher(
                table, ctx.genomes_dir, keep_genomes=keep_genomes,
                format_genomes=format_genomes, downloader=ctx.gdl(),
            )

    if candidates and not updated:
        with metrics.stage(f"load_index:{gs}"):
            return artifact.load_index(candidates[-1])

    if not genomes:
        return None
    target = candidates[-1] if candidates else idir / gs
    rt.touch_sentinel(ctx.root, rt.S_ENTERED_INDEXER)
    with metrics.stage(f"build_index:{gs}", items=sum(1 for _ in genomes)):
        built = build_index(
            genomes, n_shards=n_shards, max_shard_bytes=max_shard_bytes, k=k, w=w,
            frac=frac,
        )
        artifact.save_index(built, target)
    rt.touch_sentinel(ctx.root, rt.S_FINISHED_INDEXING)
    rt.touch_sentinel(ctx.root, rt.S_DATABASE_CREATED)
    return built


@dataclass
class AnalysisConfig:
    query_folder: str
    output_folder: str | None = None
    guests: list[str] = field(default_factory=list)
    hosts: list[str] = field(default_factory=list)
    focus: list[str] = field(default_factory=list)
    mode: str = "single"  # database selection mode
    alignment_mode: str = "query_length"  # count mode
    n_shards: int = 1
    max_shard_bytes: int | None = None  # -im byte budget (HBM-resident
    # index is ~3 bytes/base: packed codes + sorted table; /4 of the
    # budget keeps headroom — the reference's RAM/4/16 heuristic analog)
    k: int = 15
    w: int = 10
    frac: float = 1.0  # scaled-winnowing fraction (index + query side)
    extend: bool = True
    band: int = 64
    reads_threshold: float = 0.0
    show_legend: bool = True
    auto_open: bool = False
    keep_genomes: bool = True
    format_genomes: str | None = None
    indexes: list[str] = field(default_factory=list)
    overnight: bool = False
    watch: bool = False
    poll_s: float = 5.0
    max_idle_polls: int | None = 1
    max_batch: int = 4096
    # data-parallel mesh axis size: 1 = single device, -1 = auto (use
    # every device), N>1 = exactly N.  The total device need is
    # n_data × n_shards (SURVEY.md §2 parallelism table: reads over the
    # ``data`` axis, index shards over the ``index`` axis).
    n_data: int = 1


def resolve_mesh(n_data: int, n_shards: int):
    """Build the ('data','index') product mesh for a run, or None for
    the single-device path.  The reference's analog is its thread pool
    over sample files (`monica/genomes/aligner.py:89-103`); here one
    read batch is SPMD-sharded over chips instead.

    The index axis does NOT have to equal the shard count: each index
    rank holds ceil(n_shards/n_index) shards (rank-major grouped
    stacking, `pipeline.stack_mesh_shard_groups`), so a 5-shard index
    runs fine on a (data=4, index=2) mesh.  The axis is sized to the
    largest divisor of the device budget that is <= n_shards (more
    index ranks than shards would idle devices on empty padding)."""
    if not n_data or n_data == 1:
        return None  # single-device path: shards stacked, lax.map merge
    import jax

    from monica_tpu.parallel import mesh as pm

    n_dev = len(jax.devices())
    auto = n_data == -1
    if auto:
        # largest DIVISOR of the device count that is <= n_shards: uses
        # every device (a non-divisor index axis would idle the
        # remainder and collapse data parallelism — e.g. 5 shards on 8
        # devices must become (data=2, index=4), not (data=1, index=5))
        n_index = max(
            d for d in range(1, n_dev + 1)
            if n_dev % d == 0 and d <= max(n_shards, 1)
        )
        n_data = n_dev // n_index
    else:
        if n_data > n_dev:
            raise SystemExit(
                f"--n_data {n_data} needs {n_data} devices, but only "
                f"{n_dev} are available"
            )
        n_index = min(max(n_shards, 1), n_dev // n_data)
    need = n_data * n_index
    if need == 1:
        return None  # degenerate mesh: stacked single-device path
    if jax.process_count() > 1 and need != n_dev:
        # a mesh over a device SUBSET can strand some hosts' devices
        # entirely, breaking the per-process feed contract
        # (make_array_from_process_local_data needs every process to
        # own data-axis rows) — refuse rather than deadlock
        raise SystemExit(
            f"multi-host mesh must span all {n_dev} devices, but "
            f"n_data={n_data} x n_index={n_index} = {need}; adjust "
            "--n_data/-n (or use --n_data auto)"
        )
    return pm.make_mesh(n_data=n_data, n_index=n_index, devices=jax.devices()[:need])


def run_analysis(ctx: DataContext, cfg: AnalysisConfig, metrics: Metrics | None = None):
    """The default-run pipeline (`main_after_seq`)."""
    metrics = metrics or Metrics()
    query = Path(cfg.query_folder)
    output = Path(cfg.output_folder or query / "monica_output")
    output.mkdir(parents=True, exist_ok=True)
    rootutil.dump_params(ctx.root, vars(cfg))

    guests = expand_species_args(cfg.guests)
    hosts = expand_species_args(cfg.hosts)
    focus = expand_species_args(cfg.focus)
    if cfg.mode == "overnight":
        cfg.overnight = True

    # fresh-run accumulator clear (reference helpers.initializer)
    AbundanceState.clear(output)

    parts = []
    g_built = resolve_group_index(
        ctx, "G", guests, cfg.mode, cfg.n_shards, cfg.k, cfg.w,
        max_shard_bytes=cfg.max_shard_bytes,
        extra_index_dirs=cfg.indexes, format_genomes=cfg.format_genomes,
        keep_genomes=cfg.keep_genomes, metrics=metrics, frac=cfg.frac,
    )
    if g_built:
        parts.append(g_built)
    for host in hosts:
        h_built = resolve_group_index(
            ctx, "H", [host], "single", 1, cfg.k, cfg.w,
            extra_index_dirs=cfg.indexes, format_genomes=cfg.format_genomes,
            keep_genomes=cfg.keep_genomes, fetch_mode="single", metrics=metrics,
            frac=cfg.frac,
        )
        if h_built:
            parts.append(h_built)
    if not parts:
        print("No indexes available — nothing to align against")
        return None

    built = merge_built(parts)
    params = pl.ClassifyParams(extend=cfg.extend, band=cfg.band)
    mesh = resolve_mesh(cfg.n_data, len(built.shards))
    if mesh is not None:
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    classifier = rt.Classifier(built, params, count_mode=cfg.alignment_mode, mesh=mesh)

    focus_units = frozenset("_".join(f.split(" ")) for f in focus)

    def export_and_plot(_reports):
        state = AbundanceState.load(output, built.meta.n_accessions)
        if not state.samples:
            return
        # overnight: genus-collapsed tax units in the exported tables
        # (reference counts under the collapsed key, aligner.py:237-263)
        norm, raw = export_tables(
            state, built.meta, output, overnight=cfg.overnight
        )
        barplot.plotter(
            norm, raw, output,
            reads_threshold=cfg.reads_threshold,
            hosts=hosts, guests=guests, mode=cfg.mode,
            show_legend=cfg.show_legend, auto_open=cfg.auto_open,
        )

    run_kwargs = dict(
        focus_taxa=focus_units, overnight=cfg.overnight,
        metrics=metrics, max_batch=cfg.max_batch,
    )
    if cfg.watch:
        reports = rt.watch(
            classifier, query, output,
            poll_s=cfg.poll_s, max_idle_polls=cfg.max_idle_polls,
            on_batch=export_and_plot, **run_kwargs,
        )
    else:
        reports = rt.run_once(classifier, query, output, **run_kwargs)
        export_and_plot(reports)

    if not reports:
        print("Mapping on selected database did not produce any result")
        return reports

    # focus second pass (monica.py:455-479)
    if focus:
        f_built = resolve_group_index(
            ctx, "F", focus, "focus", 1, cfg.k, cfg.w,
            extra_index_dirs=cfg.indexes, keep_genomes=cfg.keep_genomes,
            fetch_mode="focus", metrics=metrics, frac=cfg.frac,
        )
        focus_query = query / rt.FOCUS_DIR
        if f_built and focus_query.exists():
            print("Entering focus mode")
            focus_out = output / "focus"
            focus_out.mkdir(parents=True, exist_ok=True)
            AbundanceState.clear(focus_out)
            f_clf = rt.Classifier(
                f_built, params, count_mode=cfg.alignment_mode,
                mesh=resolve_mesh(cfg.n_data, len(f_built.shards)),
            )
            f_reports = rt.run_once(
                f_clf, focus_query, focus_out, metrics=metrics, max_batch=cfg.max_batch
            )
            if f_reports:
                f_state = AbundanceState.load(focus_out, f_built.meta.n_accessions)
                f_norm, f_raw = export_tables(f_state, f_built.meta, focus_out)
                barplot.plotter(
                    f_norm, f_raw, focus_out, reads_threshold=0,
                    guests=focus, mode="focus",
                    show_legend=cfg.show_legend, auto_open=cfg.auto_open,
                )
            else:
                print("Mapping on selected database to focus on did not produce any result")
    return reports


def build_index_only(
    ctx: DataContext, cfg: AnalysisConfig, indexes_folder: str | None = None,
    metrics: Metrics | None = None,
) -> list[Path]:
    """`monica build_index` analog: fetch + build + cache, no alignment
    (reference main_build_index, monica.py:484-741)."""
    metrics = metrics or Metrics()
    built_paths: list[Path] = []
    guests = expand_species_args(cfg.guests)
    hosts = expand_species_args(cfg.hosts)
    focus = expand_species_args(cfg.focus)
    idir = rootutil.indexes_dir(ctx.root)
    groups = []
    if guests:
        groups.append(("G", guests, cfg.mode, cfg.n_shards, cfg.mode))
    for h in hosts:
        groups.append(("H", [h], "single", 1, "single"))
    if focus:
        groups.append(("F", focus, "focus", 1, "focus"))
    for prefix, species, mode, n_shards, fetch_mode in groups:
        built = resolve_group_index(
            ctx, prefix, species, mode, n_shards, cfg.k, cfg.w,
            keep_genomes=cfg.keep_genomes, format_genomes=cfg.format_genomes,
            fetch_mode=fetch_mode, metrics=metrics, frac=cfg.frac,
        )
        if built is None:
            continue
        gs = group_string(prefix, species, mode, n_shards, cfg.k, cfg.w, cfg.frac)
        target = idir / gs
        if indexes_folder:
            # clone/register outside folder (reference monica.py:563-604)
            outside = Path(indexes_folder) / gs
            if not artifact.is_index_dir(outside):
                artifact.save_index(built, outside)
            artifact.register_outside_index(ctx.root, outside)
            built_paths.append(outside)
        else:
            built_paths.append(target)
    for p in built_paths:
        print(p)
    return built_paths
