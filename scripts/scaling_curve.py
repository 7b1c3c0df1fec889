#!/usr/bin/env python
"""Measured multi-device scaling curve on the virtual CPU mesh
(VERDICT r4 weak #4 / next-round item 8).

Multi-chip TPU hardware is not reachable from this environment, so
absolute throughput here is meaningless — but the OVERHEAD SHAPE of the
sharded program is measurable: how per-dispatch wall time grows as the
``data`` axis widens at fixed per-device rows (weak scaling: perfect =
flat), what the ``index`` axis's all_gather/merge costs on top of a
single-shard program, and what the multi-host lockstep batch-schedule
agreement costs per sample.  These measured fractions replace the pure
work-conserving assumption in the PODSCALE capacity model
(scripts/podscale_model.py --scaling).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
         python scripts/scaling_curve.py [--out SCALING_r05.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except RuntimeError:
    pass


def median_dispatch_seconds(clf, codes, lens, reps=7):
    """Steady-state per-dispatch wall: dispatch + full result fetch."""
    # warm (compile)
    r, c = clf.classify(codes, lens)
    clf.fetch(r, c)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r, c = clf.classify(codes, lens)
        clf.fetch(r, c)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r05.json")
    ap.add_argument("--rows_per_device", type=int, default=64)
    ap.add_argument("--glen", type=int, default=120_000)
    args = ap.parse_args()

    from monica_tpu.align import pipeline as pl
    from monica_tpu.align import runtime as rt
    from monica_tpu.index.build import build_index_from_arrays
    from monica_tpu.io import encode as enc
    from monica_tpu.parallel import mesh as pm

    rng = np.random.default_rng(9)
    seqs = [
        rng.integers(0, 4, args.glen).astype(np.uint8) for _ in range(4)
    ]

    def reads(n, L=600):
        out = np.zeros((n, L), np.uint8)
        lens = np.full(n, L, np.int32)
        for i in range(n):
            g = seqs[int(rng.integers(0, len(seqs)))]
            s = int(rng.integers(0, len(g) - L))
            out[i] = g[s : s + L]
        return out, lens

    params = pl.ClassifyParams(n_slots=64)

    # --- weak scaling over the data axis (index=1, 1 shard) ----------
    built1 = build_index_from_arrays(seqs, n_shards=1)
    single = rt.Classifier(built1, params, count_mode="basic")
    codes1, lens1 = reads(args.rows_per_device)
    t_single = median_dispatch_seconds(single, codes1, lens1)

    data_rows = []
    for n_data in (1, 2, 4, 8):
        mesh = pm.make_mesh(n_data=n_data, n_index=1)
        clf = rt.Classifier(built1, params, count_mode="basic", mesh=mesh)
        codes, lens = reads(args.rows_per_device * n_data)
        t = median_dispatch_seconds(clf, codes, lens)
        # CONTROL: the same global batch on the meshless single-device
        # path.  The virtual devices share the host's physical cores,
        # so the mesh's wall time includes pure compute contention;
        # overhead attributable to sharding/collectives is the ratio
        # to this same-total-work control, not to the n_data=1 row.
        tc = median_dispatch_seconds(single, codes, lens)
        data_rows.append(
            dict(
                n_data=n_data,
                global_rows=args.rows_per_device * n_data,
                dispatch_s=round(t, 4),
                same_work_meshless_s=round(tc, 4),
                sharding_overhead=round(t / tc, 3),
                weak_scaling_eff=round(data_rows[0]["dispatch_s"] / t, 3)
                if data_rows
                else 1.0,
            )
        )
        print(json.dumps(data_rows[-1]), flush=True)

    # --- index-axis overhead (fixed 4 shards, data=1) ----------------
    built4 = build_index_from_arrays(seqs, n_shards=4)
    index_rows = []
    for n_index in (1, 2, 4):
        mesh = pm.make_mesh(n_data=1, n_index=n_index)
        clf = rt.Classifier(built4, params, count_mode="basic", mesh=mesh)
        codes, lens = reads(args.rows_per_device)
        t = median_dispatch_seconds(clf, codes, lens)
        index_rows.append(
            dict(
                n_index=n_index,
                shards_per_rank=len(built4.shards) // n_index,
                dispatch_s=round(t, 4),
            )
        )
        print(json.dumps(index_rows[-1]), flush=True)

    # --- lockstep schedule agreement cost per sample -----------------
    batches = [
        enc.ReadBatch(
            np.zeros((args.rows_per_device, 512), np.uint8),
            np.zeros(args.rows_per_device, np.int32),
            np.arange(args.rows_per_device, dtype=np.int32),
        )
        for _ in range(6)
    ]
    rt._sync_batch_schedule(batches)  # warm allgather program
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        rt._sync_batch_schedule(batches)
        ts.append(time.perf_counter() - t0)
    lockstep_s = float(np.median(ts))

    d8 = data_rows[-1]
    payload = {
        "what": (
            "Measured sharded-program overhead shape on the 8-device "
            "virtual CPU mesh (absolute rates are CPU-bound and NOT "
            "TPU throughput; the overhead FRACTIONS feed the PODSCALE "
            "model)."
        ),
        "rows_per_device": args.rows_per_device,
        "meshless_single_dispatch_s": round(t_single, 4),
        "data_axis_weak_scaling": data_rows,
        "index_axis": index_rows,
        "lockstep_schedule_s_per_sample": round(lockstep_s, 5),
        "derived": {
            "mesh_entry_overhead": round(
                data_rows[0]["dispatch_s"] / t_single, 3
            ),
            "sharding_overhead_8x": d8["sharding_overhead"],
            "weak_scaling_eff_8x_cpu_core_bound": d8["weak_scaling_eff"],
            "index4_vs_index1": round(
                index_rows[-1]["dispatch_s"] / index_rows[0]["dispatch_s"], 3
            ),
        },
        "reading_guide": (
            "sharding_overhead (mesh dispatch vs the SAME global batch "
            "meshless) isolates shard_map + collective cost from the "
            "8-virtual-devices-on-2-cores compute contention that "
            "dominates weak_scaling_eff here; on real chips each data "
            "rank has its own silicon and the contention term vanishes."
        ),
    }
    print(json.dumps(payload["derived"]))
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
