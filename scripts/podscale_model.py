#!/usr/bin/env python
"""BASELINE config 5 (pod-scale full-RefSeq quantification): structural
validation + capacity/traffic model.

The real workload — ~20k genomes (~60 Gbase) sharded across N>=2 hosts
of a TPU pod slice — cannot run in this environment (one tunneled
chip).  What CAN be validated is (a) the machinery at the same SHAPE:
a many-shard index (dozens of shards, several per index rank) running
through the product Classifier/run_once on a multi-device mesh with
outputs identical to the single-device path, and (b) an explicit,
assumption-labeled capacity model for the pod deployment, derived from
measured per-chip throughput and the index layout's bytes/base.

Usage: python scripts/podscale_model.py [--out PODSCALE.json]
       (runs on the virtual CPU mesh; set JAX_PLATFORMS=cpu)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# the structural run needs 8 virtual devices; config-level override
# (env vars are outranked by the axon sitecustomize's config setting)
import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass  # backend already initialized


def structural_run(n_genomes: int, glen: int, n_shards: int):
    """Many-shard index through the PRODUCT path on a (data=4, index=2)
    mesh (S_local = n_shards/2 per device) vs single-device golden."""
    import jax

    from monica_tpu.align import pipeline as pl
    from monica_tpu.align import runtime as rt
    from monica_tpu.index.build import build_index_from_arrays
    from monica_tpu.parallel import mesh as pm
    from monica_tpu.stats.abundance import AbundanceState
    import tempfile, os

    rng = np.random.default_rng(5)
    seqs = [rng.integers(0, 4, glen).astype(np.uint8) for _ in range(n_genomes)]
    built = build_index_from_arrays(seqs, n_shards=n_shards)
    mesh = pm.make_mesh(n_data=4, n_index=2)

    def reads(n):
        out = np.zeros((n, 600), np.uint8)
        lens = np.full(n, 600, np.int32)
        for i in range(n):
            g = seqs[rng.integers(0, len(seqs))]
            s = rng.integers(0, len(g) - 600)
            out[i] = g[s : s + 600]
        return out, lens

    codes, lens = reads(128)
    results = {}
    for name, mesh_arg in (("single", None), ("mesh", mesh)):
        clf = rt.Classifier(
            built, pl.ClassifyParams(n_slots=64), count_mode="basic",
            mesh=mesh_arg,
        )
        with tempfile.TemporaryDirectory() as td:
            q = os.path.join(td, "q"); out = os.path.join(td, "o")
            os.makedirs(q)
            from monica_tpu.io.encode import decode_seq
            with open(os.path.join(q, "s.fastq"), "w") as fh:
                for i, row in enumerate(codes):
                    s = decode_seq(row)
                    fh.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")
            reps = rt.run_once(clf, q, out)
            st = AbundanceState.load(out, built.meta.n_accessions)
            results[name] = (reps[0].n_mapped, st.samples["s"].copy())
    ok = (
        results["single"][0] == results["mesh"][0]
        and np.array_equal(results["single"][1], results["mesh"][1])
        and results["single"][0] > 100
    )
    return {
        "n_genomes": n_genomes,
        "n_shards": len(built.shards),
        "mesh": "(data=4, index=2) -> S_local = %d shards per device"
        % (len(built.shards) // 2),
        "mapped": int(results["single"][0]),
        "mesh_equals_single_device": bool(ok),
    }


def capacity_model():
    """20k-genome RefSeq deployment model.  Every input is labeled
    measured / layout-derived / assumption."""
    GBASE = 60e9            # ~20k genomes x ~3 Mb mean  [assumption]
    BYTES_PER_BASE = 3.0    # ref codes 1B + pos_acc 2B  [layout]
    TABLE_OVERHEAD = 1.35   # hash rows ~8x entries, entries ~2/11 bases [layout]
    SHARD_BASES = 1 << 26   # hard cap (ops/lookup tag bits) [layout]
    HBM_PER_CHIP = 16e9     # v5e                        [spec]
    READS_PER_S_1SHARD = 230_108  # measured, 64 Mbase shard [BENCH r4]
    total_bytes = GBASE * BYTES_PER_BASE * TABLE_OVERHEAD
    n_shards = int(np.ceil(GBASE / SHARD_BASES))
    shard_bytes = total_bytes / n_shards
    # every read scores every shard (reference semantics), so the pod's
    # aggregate capacity is work-conserving: n_chips x (per-chip rate at
    # one 64 Mbase shard) shard-scorings/s spread over n_shards
    # scorings per read.  Throughput = R1 x n_chips / n_shards for ANY
    # (data, index) mesh split — the split only moves HBM: a chip on
    # index rank i holds s_local = n_shards / n_index shards, so
    # n_index is chosen to keep s_local x shard_bytes under HBM and the
    # data axis takes the rest.  (Slightly conservative: sketching is
    # hoisted across the shard loop, measured SUPER-linear per-shard
    # efficiency on the 5-shard config-3 index, PERF_r03.)
    rows = []
    for n_chips in (64, 128, 256):
        # smallest index axis whose shard group fits comfortably in HBM
        n_index = next(
            i for i in (1, 2, 4, 8, 16, 32, 64)
            if i <= n_chips
            and np.ceil(n_shards / i) * shard_bytes < HBM_PER_CHIP * 0.5
        )
        s_local = int(np.ceil(n_shards / n_index))
        hbm = s_local * shard_bytes
        reads_per_s = READS_PER_S_1SHARD * n_chips / n_shards
        rows.append({
            "chips": n_chips,
            "mesh": f"(data={n_chips // n_index}, index={n_index})",
            "index_shards": n_shards,
            "shards_per_chip": s_local,
            "hbm_per_chip_gb": round(hbm / 1e9, 2),
            "fits_16gb_hbm": bool(hbm < HBM_PER_CHIP * 0.8),
            "modeled_reads_per_s": int(reads_per_s),
            "note": "work-conserving bound: each read all_gathers "
                    "ShardHit rows (10 fields x 4B x batch) over ICI; "
                    "counts psum is one (n_acc,) vector per batch",
        })
    return {
        "inputs": {
            "genomes": "~20k RefSeq bacteria+archaea+fungi, ~60 Gbase [assumption]",
            "bytes_per_base": "3.0 packed codes + accession map [layout-derived]",
            "table_overhead": "1.35x for the direct-addressed hash rows [layout-derived]",
            "per_shard_throughput": "230,108 reads/s on one v5e chip at 64 Mbase [measured, BENCH r4]",
        },
        "per_batch_dcn_traffic": "zero on the feed path (each host feeds its "
            "own rows); ICI all_gather of per-shard hits + one psum'd count "
            "vector; host fetch = 3 int32 rows x local batch",
        "scaling_rows": rows,
        "caveat": "MODEL, not a measurement: multi-chip hardware is not "
            "available in this environment.  The machinery it assumes is "
            "validated at shape by structural_run and the 2-process "
            "product tests (tests/test_multihost.py).",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out")
    ap.add_argument("--scaling", help="SCALING_r05.json from scripts/"
                    "scaling_curve.py: folds the MEASURED sharded-program "
                    "overheads into the model")
    args = ap.parse_args()
    t0 = time.time()
    structural = structural_run(n_genomes=24, glen=60_000, n_shards=24)
    model = capacity_model()
    if args.scaling:
        with open(args.scaling) as fh:
            sc = json.load(fh)
        d = sc["derived"]
        # apply the measured sharding overhead as a throughput derate on
        # the work-conserving bound (conservative: the CPU-mesh number
        # includes scheduling effects real chips do not pay; <1.0 means
        # the sharded program was measured FASTER than same-work
        # single-device, so no derate is taken)
        derate = max(float(d["sharding_overhead_8x"]), 1.0)
        for row in model["scaling_rows"]:
            row["modeled_reads_per_s_with_measured_overhead"] = int(
                row["modeled_reads_per_s"] / derate
            )
        model["measured_overheads"] = {
            "source": args.scaling,
            "mesh_entry_overhead": d["mesh_entry_overhead"],
            "sharding_overhead_8x_data": d["sharding_overhead_8x"],
            "index4_vs_index1_dispatch": d["index4_vs_index1"],
            "lockstep_schedule_s_per_sample": sc[
                "lockstep_schedule_s_per_sample"
            ],
            "applied_derate": derate,
            "note": sc["reading_guide"],
        }
    payload = {
        "config": "BASELINE config 5: pod-scale full-RefSeq quantification",
        "structural_validation": structural,
        "capacity_model": model,
        "seconds": round(time.time() - t0, 1),
        "verdict": "PASS" if structural["mesh_equals_single_device"] else "FAIL",
    }
    print(json.dumps(payload))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
    sys.exit(0 if payload["verdict"] == "PASS" else 1)


if __name__ == "__main__":
    main()
