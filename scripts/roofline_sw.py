#!/usr/bin/env python
"""Banded-SW kernel roofline on the real chip (VERDICT r4 missing #4:
BASELINE.md's kernel row still cited the r3 kernel's 13.9 Gcells/s; the
r4/r5 kernels — packed (score,mlen) DP, two-reads-per-row pairs kernel,
max_gap=16 prefix-max — were never re-rooflined).

Speed-of-light here is EMPIRICAL, not a datasheet number: a pure
elementwise int32 op chain measures the chip's achieved VPU lane-ops/s
through this exact jit/dispatch path, and the DP's per-cell op count
(counted from ops/extend.py _row_update) converts that ceiling into
cells/s.  Both kernels are then measured against it.

Usage: python scripts/roofline_sw.py [--out ROOFLINE_r05.json]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from monica_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

# per-cell VPU op count of the packed-DP row update (ops/extend.py
# _row_update): compare+select for the substitution term (2), packed
# add + max for vertical gap (2), prefix-max pair passes for the
# horizontal term at max_gap=16 -> ceil(log2(16)) = 4 passes x 2 ops
# (shift-select on the packed lane pair), local floor max (1):
OPS_PER_CELL_PACKED = 2 + 2 + 4 * 2 + 1  # = 13 conservative count
OPS_PER_CELL_MIN = 6  # the optimistic count used in r4 notes


def measure_vpu_ops_per_s():
    """Achieved int32 elementwise ops/s (the ceiling any VPU-bound
    kernel can reach on this chip + runtime), measured DIFFERENTIALLY:
    wall(unroll=1024) - wall(unroll=256) cancels the fixed per-dispatch
    cost (the tunneled runtime pays ~25-50 ms of round-trips per call,
    which swamped absolute timings of any reasonably sized chain), so
    the slope isolates the ALU rate.  The chain is fully unrolled
    inside one fused kernel and reduces to a scalar (fetching a full
    array through the 21 MB/s link measures the link, not the chip)."""
    size = (2048, 1024)  # 2M lanes of int32

    def make(unroll):
        @jax.jit
        def chain(x):
            y = x
            for i in range(unroll):
                y = (y + x) ^ (y >> 1) ^ np.int32(2 * i + 1)
            return y.sum()

        return chain

    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 30, size, dtype=np.int32)
    )
    walls = {}
    n = size[0] * size[1]
    for unroll in (256, 1024):
        f = make(unroll)
        np.asarray(f(x))  # compile + sync
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        walls[unroll] = float(np.median(ts))
    d_ops = 3 * (1024 - 256) * n
    d_t = max(walls[1024] - walls[256], 1e-6)
    return d_ops / d_t


def measure_kernel(band: int, B: int = 4096, L: int = 1024, reps: int = 5):
    from monica_tpu.ops import extend as ex

    rng = np.random.default_rng(1)
    p = ex.ExtendParams(band=band)
    q = jnp.asarray(rng.integers(0, 4, (B, L), dtype=np.uint8))
    refwin = jnp.asarray(
        rng.integers(0, 4, (B, L + band), dtype=np.uint8)
    )
    lengths = jnp.full((B,), L, jnp.int32)

    fn = jax.jit(
        lambda q, r, l: ex.banded_sw(q, r, l, p, impl="pallas")
    )
    s, m = fn(q, refwin, lengths)
    np.asarray(s)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s, m = fn(q, refwin, lengths)
        np.asarray(s)  # sync via host fetch (tunnel: block_until_ready lies)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    cells = B * L * band
    return dict(
        band=band,
        batch=B,
        read_len=L,
        kernel="pairs (2 reads / 128 lanes)" if band <= 64 else "single",
        seconds_median=round(dt, 4),
        seconds_best=round(min(ts), 4),
        gcells_per_s=round(cells / dt / 1e9, 2),
        gcells_per_s_best=round(cells / min(ts) / 1e9, 2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ROOFLINE_r05.json")
    args = ap.parse_args()

    vpu = measure_vpu_ops_per_s()
    rows = [measure_kernel(64), measure_kernel(128)]
    for r in rows:
        print(json.dumps(r), flush=True)
    sol_cons = vpu / OPS_PER_CELL_PACKED
    sol_opt = vpu / OPS_PER_CELL_MIN
    best = max(r["gcells_per_s_best"] for r in rows)
    payload = dict(
        what=(
            "r5 banded-SW roofline: measured kernels vs an EMPIRICAL "
            "VPU ceiling (int32 elementwise chain through the same "
            "jit/dispatch path), converted to cells/s by the counted "
            "per-cell op cost of the packed DP row update."
        ),
        device=str(jax.devices()[0].device_kind),
        measured_vpu_gops_per_s=round(vpu / 1e9, 1),
        ops_per_cell=dict(
            conservative=OPS_PER_CELL_PACKED, optimistic=OPS_PER_CELL_MIN
        ),
        speed_of_light_gcells_per_s=dict(
            conservative=round(sol_cons / 1e9, 1),
            optimistic=round(sol_opt / 1e9, 1),
        ),
        kernels=rows,
        fraction_of_light=dict(
            conservative=round(best / (sol_cons / 1e9), 2),
            optimistic=round(best / (sol_opt / 1e9), 2),
        ),
        r3_baseline_gcells_per_s=13.9,
    )
    print(json.dumps({k: payload[k] for k in (
        "measured_vpu_gops_per_s", "speed_of_light_gcells_per_s",
        "fraction_of_light")}))
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1)


if __name__ == "__main__":
    main()
