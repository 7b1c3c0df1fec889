"""End-to-end drive on the current backend (verify-skill recipe)."""
import sys, numpy as np, time, traceback, pathlib, shutil
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from fixtures import random_genome, sample_reads, make_fasta_gz, make_fastq
rng = np.random.default_rng(42)
seqs = [random_genome(rng, 30000) for _ in range(3)]
genomes = []
for i, g in enumerate(seqs):
    make_fasta_gz(f"/tmp/v_g{i}.fna.gz", [(f"ctg{i}", g)])
    genomes.append((f"/tmp/v_g{i}.fna.gz", [f"Sp_{i}", f"ACC{i:03d}.1"]))
from monica_tpu.index.build import build_index
from monica_tpu.align import pipeline as pl, runtime as rt
built = build_index(genomes, n_shards=2)
clf = rt.Classifier(built, pl.ClassifyParams(extend=True, band=128), count_mode="basic")
q = pathlib.Path("/tmp/v_query"); shutil.rmtree(q, ignore_errors=True); q.mkdir()
out = pathlib.Path("/tmp/v_out"); shutil.rmtree(out, ignore_errors=True)
reads, labels = sample_reads(rng, seqs, 50, read_len=1200, error=(0.04, 0.03, 0.03))
make_fastq(q / "s1.fastq", reads)
t0 = time.time()
reports = rt.run_once(clf, q, out, focus_taxa=frozenset({"Sp_0"}), delete=True)
r = reports[0]
print("mapped", r.n_mapped, "unmapped", r.n_unmapped, "ambiguous", r.n_ambiguous,
      "focus", r.n_focus, f"{time.time()-t0:.1f}s")
from monica_tpu.stats.abundance import AbundanceState, export_tables
st = AbundanceState.load(out, clf.meta.n_accessions)
print("counts", st.samples["s1"], "total", int(st.samples["s1"].sum()))
export_tables(st, clf.meta, out)
assert r.n_mapped >= 45, "expected >=90% mapped"
print("VERIFY OK (real TPU, extend=True pallas, 2-shard stacked)")
