#!/usr/bin/env python
"""Kernel benchmark: banded Smith–Waterman Pallas throughput (Mcells/s).

The BASELINE.md kernel target ("SW Mcells/s per chip at speed-of-light
cell updates").  Cells = reads × read_len × band.  Run on the real TPU:
    python scripts/bench_sw.py [batch] [read_len] [band]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from monica_tpu.ops import extend as ex

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 64  # production default
    # (<= 64 engages the two-reads-per-row pairs kernel, ops/extend.py)

    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 4_000_000).astype(np.uint8)
    starts = rng.integers(0, len(ref) - L - W, B)
    q = np.stack([ref[s : s + L] for s in starts])
    m = rng.random(q.shape) < 0.08
    q[m] = rng.integers(0, 4, int(m.sum()))
    lengths = np.full(B, L, np.int32)

    p = ex.ExtendParams(band=W)
    refwin = ex.extract_ref_windows(jnp.asarray(ref), jnp.asarray(starts.astype(np.int32)), L, W)

    fn = jax.jit(lambda q, r, l: ex.banded_sw(q, r, l, p, impl="pallas"))
    qd, ld = jnp.asarray(q), jnp.asarray(lengths)
    s, ml = fn(qd, refwin, ld)
    np.asarray(s)  # compile + sync

    reps = 5
    t0 = time.time()
    for _ in range(reps):
        s, ml = fn(qd, refwin, ld)
    s_h = np.asarray(s)
    dt = (time.time() - t0) / reps

    cells = B * L * W
    mcells = cells / dt / 1e6
    sys.stderr.write(
        f"[bench_sw] B={B} L={L} W={W} dt={dt*1e3:.2f}ms "
        f"median_score={np.median(s_h):.0f} device={jax.devices()[0].device_kind}\n"
    )
    print(
        json.dumps(
            {
                "metric": "banded_sw_mcells_per_s_per_chip",
                "value": round(mcells, 1),
                "unit": "Mcells/s",
                # CPU SIMD SW (e.g. ksw2) sustains ~1-5 Gcells/s/core;
                # use 3 Gcells/s as the single-core baseline denominator
                "vs_baseline": round(mcells / 3000.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
