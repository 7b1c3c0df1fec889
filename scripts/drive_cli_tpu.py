"""Drive the full CLI surface offline on the current backend."""
import sys, gzip, pathlib, shutil
import numpy as np
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from fixtures import random_genome, sample_reads, make_fastq
from monica_tpu.data import tables as tb
from monica_tpu import cli

tmp = pathlib.Path("/tmp/cli_world"); shutil.rmtree(tmp, ignore_errors=True); tmp.mkdir()
rng = np.random.default_rng(51)
taxdump = tmp / "taxdump"; taxdump.mkdir()
nodes = [(1,1),(2,1),(10,2),(11,10),(20,2),(21,20)]
names = {1:"root",2:"Bacteria",10:"Agenus",11:"Agenus alpha",20:"Bgenus",21:"Bgenus beta"}
(taxdump/"nodes.dmp").write_text("".join(f"{c}\t|\t{p}\t|\tr\t|\n" for c,p in nodes))
(taxdump/"names.dmp").write_text("".join(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n" for t,n in names.items()))
gdir = tmp/"genome_files"; gdir.mkdir()
rows, seqs = [], {}
for tid, acc, org in [(11,"GCF_1.1","Agenus alpha"), (21,"GCF_2.1","Bgenus beta")]:
    g = random_genome(rng, 50_000); seqs[org] = g
    with gzip.open(gdir/f"{acc}_s_genomic.fna.gz","wt") as fh: fh.write(f">c\n{g}\n")
    rows.append({"# assembly_accession":acc,"taxid":str(tid),"species_taxid":str(tid),
                 "organism_name":org,"infraspecific_name":"na","ftp_path":f"https://x/{acc}_s"})
summary = tmp/"summary.tsv"; tb.write_fixture_summary(summary, rows)
q = tmp/"query"; q.mkdir()
reads, labels = sample_reads(rng, [seqs["Agenus alpha"], seqs["Bgenus beta"]], 200, read_len=1000, error=(0.05,0.03,0.03))
make_fastq(q/"flowcell1.fastq", reads)
rc = cli.main([
    "--root", str(tmp/"root"), "--taxdump", str(taxdump),
    "--offline_tables", str(summary), str(summary), "--offline_genomes", str(gdir),
    "-q", str(q), "-G", "Agenus alpha", "Bgenus beta", "-m", "single",
    "--extend", "--not_auto_open_plot",
])
assert rc == 0
out = q/"monica_output"
for f in ["monica.dataframe","raw_monica.dataframe","monica.barplot.html","metrics.json"]:
    assert (out/f).exists(), f
import pandas as pd
raw = pd.read_csv(out/"raw_monica.dataframe", index_col=(0,1))
print(raw)
mapped = sum(1 for _ in open(q/"mapped"/"flowcell1.fastq")) // 4
print("mapped reads:", mapped, "/ 200")
assert mapped >= 180
print("CLI VERIFY OK on backend:", __import__("jax").default_backend())
