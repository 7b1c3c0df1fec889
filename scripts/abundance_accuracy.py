#!/usr/bin/env python
"""Quantification accuracy: estimated relative abundances vs the TRUE
mixture composition (ABUNDANCE_r05.json).

Per-read route accuracy (CONCORDANCE/PARITY artifacts) measures
classification; the reference's actual product is QUANTITATIVE
metagenomics — per-taxon relative abundance after BPB/BPM
normalization (`monica/genomes/aligner.py:305-319`).  This harness
closes that loop: simulate a flowcell from a mock community at KNOWN
mixture proportions (reads drawn per-genome at controlled depth,
nanopore error profiles), run the PRODUCT path (Classifier ->
run_once -> export_tables in query_length mode), and compare the
normalized BPM vector against the ground-truth composition.

Metrics per profile:
* L1 composition error (sum |est - true| over taxa; 0 = perfect),
* max per-taxon relative error among taxa with true share >= 1%,
* unassigned mass (reads not contributing: unmapped + ambiguous).

Gate: L1 <= 0.05 and max relative error <= 10% for profiles up to
r9_hac (r9_old reported; its unmapped tail biases composition toward
easier genomes and is not gated).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python scripts/abundance_accuracy.py [--quick] [--out FILE]
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

import numpy as np

PROFILES = [
    ("r10_sup", (0.01, 0.005, 0.005)),
    ("r10_fast", (0.03, 0.02, 0.02)),
    ("r9_hac", (0.05, 0.03, 0.03)),
    ("r9_old", (0.08, 0.05, 0.05)),
]
GATED = ("r10_sup", "r10_fast", "r9_hac")
L1_TARGET = 0.05
REL_TARGET = 0.10


def run_profile(built, seqs, mixture, error, n_reads, read_len, workdir):
    from monica_tpu import evaluation as ev
    from monica_tpu.align import pipeline as pl, runtime as rt
    from monica_tpu.stats.abundance import AbundanceState, normalize

    rng = np.random.default_rng(13)
    sub, ins, dele = error
    glens = np.array([len(s) for s in seqs], dtype=np.float64)

    labels = rng.choice(len(seqs), size=n_reads, p=np.asarray(mixture))
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    q = Path(workdir) / "q"
    q.mkdir(parents=True, exist_ok=True)
    emitted = np.zeros(len(seqs), dtype=np.float64)  # bases per genome
    with open(q / "mix.fastq", "w") as fh:
        for i in range(n_reads):
            r = ev.simulate_read_codes(
                rng, seqs[labels[i]], read_len, sub, ins, dele,
                bool(rng.random() < 0.5),
            )
            emitted[labels[i]] += len(r)
            fh.write(
                f"@read{i} mix\n{lut[r].tobytes().decode()}\n+\n{'I'*len(r)}\n"
            )
    # BPM ground truth from the REALIZED flowcell (not the sampling
    # distribution — the multinomial draw itself carries a few percent
    # of per-taxon noise at these depths, which is simulator noise, not
    # pipeline error): query_length counts = emitted bases per genome,
    # BPB divides by genome length, BPM renormalizes.
    truth = emitted / glens
    truth = truth / truth.sum()
    out = Path(workdir) / "o"
    clf = rt.Classifier(
        built, pl.ClassifyParams(), count_mode="query_length"
    )
    reports = rt.run_once(clf, q, out)
    rep = reports[0]
    state = AbundanceState.load(out, built.meta.n_accessions)
    est = normalize(state, built.meta.genome_lengths)["mix"]
    l1 = float(np.abs(est - truth).sum())
    major = truth >= 0.01
    rel = float(
        np.max(np.abs(est[major] - truth[major]) / truth[major])
    )
    return dict(
        n_reads=n_reads,
        l1_error=round(l1, 4),
        max_rel_error_major_taxa=round(rel, 4),
        unassigned_frac=round(
            (rep.n_unmapped + rep.n_ambiguous) / max(rep.n_reads, 1), 4
        ),
        est=[round(float(x), 4) for x in est],
        truth=[round(float(x), 4) for x in truth],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="ABUNDANCE_r05.json")
    ap.add_argument("--n_reads", type=int, default=8192)
    ap.add_argument("--read_len", type=int, default=1000)
    args = ap.parse_args()
    if args.quick:
        args.n_reads = 2048

    from monica_tpu import evaluation as ev
    from monica_tpu.index.build import build_index_from_arrays

    rng = np.random.default_rng(11)
    # 6 genomes, staggered sizes AND a skewed log-ish mixture —
    # length-correction (BPB) must not confound composition
    glens = [400_000, 400_000, 200_000, 200_000, 100_000, 100_000]
    if args.quick:
        glens = [g // 2 for g in glens]
    seqs = [rng.integers(0, 4, g).astype(np.uint8) for g in glens]
    # conserved blocks make a small genuinely-ambiguous mass, as in the
    # concordance community
    block = rng.integers(0, 4, 2000).astype(np.uint8)
    seqs[0][10_000:12_000] = block
    seqs[1][50_000:52_000] = block
    mixture = np.array([0.4, 0.25, 0.15, 0.1, 0.07, 0.03])
    built = build_index_from_arrays(seqs)

    rows = []
    for pname, error in PROFILES:
        with tempfile.TemporaryDirectory() as td:
            t0 = time.time()
            r = run_profile(
                built, seqs, mixture, error, args.n_reads,
                args.read_len, td,
            )
            r["profile"] = pname
            r["seconds"] = round(time.time() - t0, 1)
            rows.append(r)
            print(json.dumps(r), flush=True)

    gated = [r for r in rows if r["profile"] in GATED]
    ok = all(
        r["l1_error"] <= L1_TARGET
        and r["max_rel_error_major_taxa"] <= REL_TARGET
        for r in gated
    )
    payload = dict(
        what=(
            "End-to-end QUANTIFICATION accuracy: BPM composition "
            "estimates (product path, query_length mode) vs known "
            "mixture truth on a skewed 6-genome community with "
            "length-staggered genomes and conserved blocks."
        ),
        gate=dict(profiles=list(GATED), l1=L1_TARGET,
                  max_rel_major=REL_TARGET, passed=ok),
        mixture=[float(x) for x in mixture],
        genome_lengths=glens,
        rows=rows,
    )
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(dict(gate_pass=ok, out=args.out)))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
