#!/usr/bin/env python
"""Accuracy harness driver: classification accuracy vs ground truth
over error rates / read lengths / pipeline settings.

The BASELINE.md concordance target (>=95% read-assignment concordance)
is measured here as ground-truth assignment accuracy on a mock
community with conserved shared blocks (see monica_tpu/evaluation.py).

Gating: exits 1 when the worst-case accuracy of the DEFAULT settings
over the supported error profiles (<= r9_hac; r9_old is legacy
chemistry, reported but not gated) falls below 0.95.  Sweep rows
(deliberately degraded knobs) are reported for tuning but never gate.

Usage: python scripts/concordance.py [--quick] [--sweep]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np

TARGET = 0.95
GATED_PROFILES = ("r10_sup", "r10_fast", "r9_hac")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small sizes (CPU-friendly)")
    ap.add_argument("--sweep", action="store_true", help="sweep pipeline knobs")
    ap.add_argument("--n_genomes", type=int, default=8)
    ap.add_argument("--glen", type=int, default=500_000)
    ap.add_argument("--n_reads", type=int, default=1024)
    ap.add_argument("--out", help="write a JSON artifact (rows + verdict) here")
    args = ap.parse_args()

    from monica_tpu import evaluation as ev
    from monica_tpu.align import pipeline as pl
    from monica_tpu.index.build import build_index_from_arrays

    if args.quick:
        args.n_genomes, args.glen, args.n_reads = 4, 60_000, 192

    rng = np.random.default_rng(11)
    seqs = ev.mock_community(rng, args.n_genomes, args.glen)

    # one index per distinct frac (frac is an index-side property;
    # evaluate() copies IndexMeta.frac into the query params)
    indexes: dict[float, object] = {}

    def index_for(frac: float):
        if frac not in indexes:
            indexes[frac] = build_index_from_arrays(seqs, frac=frac)
        return indexes[frac]

    # nanopore-like error profiles: (sub, ins, del) roughly R9 -> R10.4
    profiles = [
        ("r10_sup", (0.01, 0.005, 0.005)),
        ("r10_fast", (0.03, 0.02, 0.02)),
        ("r9_hac", (0.05, 0.03, 0.03)),
        ("r9_old", (0.08, 0.05, 0.05)),
    ]
    read_lens = [300, 1000] if args.quick else [300, 1000, 5000]

    # (name, params, frac)
    settings = [("default", pl.ClassifyParams(), 1.0)]
    if args.sweep:
        settings += [
            ("slots64", pl.ClassifyParams(n_slots=64), 1.0),
            ("slots96", pl.ClassifyParams(n_slots=96), 1.0),
            ("slots64_a2", pl.ClassifyParams(n_slots=64, anchors_per_seed=2), 1.0),
            ("slots96_a2", pl.ClassifyParams(n_slots=96, anchors_per_seed=2), 1.0),
            # throughput knob (PERF_r03 "throughput_knob"): +12% reads/s,
            # watch the precision column — a1 trades it
            ("a1", pl.ClassifyParams(anchors_per_seed=1), 1.0),
            ("slots64_a1", pl.ClassifyParams(n_slots=64, anchors_per_seed=1), 1.0),
            ("frac0.5", pl.ClassifyParams(), 0.5),
            ("frac0.5_slots64", pl.ClassifyParams(n_slots=64), 0.5),
            ("frac0.25", pl.ClassifyParams(), 0.25),
            ("frac0.25_slots64", pl.ClassifyParams(n_slots=64), 0.25),
        ]

    rows = []
    for sname, params, frac in settings:
        built = index_for(frac)
        for pname, error in profiles:
            for L in read_lens:
                r = ev.evaluate(
                    built,
                    seqs,
                    params,
                    np.random.default_rng(5),
                    n_reads=args.n_reads,
                    read_len=L,
                    error=error,
                )
                r.settings = dict(setting=sname, profile=pname, read_len=L)
                rows.append(r.row())
                print(json.dumps(rows[-1]))

    gated = [
        r["accuracy"]
        for r in rows
        if r["setting"] == "default" and r["profile"] in GATED_PROFILES
    ]
    worst = min(gated)
    ok = worst >= TARGET
    if args.quick:
        # quick mode's tiny genomes put ~7% of reads inside the mock
        # community's conserved shared blocks (genuinely unmappable),
        # capping accuracy below the full-size target — so quick mode
        # has no meaningful gate and says so explicitly.
        verdict = "CEILING-LIMITED (quick mode: shared-block ceiling ~0.93, not gated)"
    else:
        verdict = "PASS" if ok else "FAIL"
    print(
        f"\nworst-case DEFAULT accuracy (profiles <= r9_hac): {worst:.4f} "
        f"(target >= {TARGET}) -> {verdict}"
    )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(
                {
                    "target": TARGET,
                    "gated_profiles": list(GATED_PROFILES),
                    "worst_gated_accuracy": worst,
                    "verdict": verdict,
                    "config": {
                        "n_genomes": args.n_genomes, "glen": args.glen,
                        "n_reads": args.n_reads, "quick": args.quick,
                    },
                    "rows": rows,
                },
                fh,
                indent=1,
            )
        print(f"artifact written to {args.out}")
    sys.exit(0 if (ok or args.quick) else 1)


if __name__ == "__main__":
    main()
