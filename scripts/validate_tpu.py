#!/usr/bin/env python
"""Real-hardware kernel validation: Pallas vs jnp oracle ON THE TPU.

The hermetic test suite runs Pallas kernels in interpret mode (CPU),
which executes the kernel's *semantics* — it cannot catch Mosaic
lowering bugs where the compiled TPU program differs from those
semantics.  One such bug shipped: ``tpu.dynamic_rotate`` with a
negative multiplied loop index (``pltpu.roll(x, -2*j)``) silently
returned wrong lanes on hardware while interpret mode matched the
oracle, collapsing banded-SW scores to noise (fixed in ops/extend.py
by carrying the block through the loop with a static positive roll).

This script runs every Pallas kernel against its jnp oracle on the
real chip and writes a JSON verdict.  Run it whenever a kernel
changes; commit the artifact.

Usage: python scripts/validate_tpu.py [--out VALIDATE_TPU.json]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from monica_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from monica_tpu.ops import extend as ex
from monica_tpu.ops.sortnet import bitonic_sort_rows


def check_sw(results, B=128, L=1024):
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 100_000).astype(np.uint8)
    starts = rng.integers(0, len(ref) - L - 128, B)
    q = np.stack([ref[s : s + L] for s in starts])
    m = rng.random(q.shape) < 0.08
    q[m] = rng.integers(0, 4, int(m.sum()))
    lengths = jnp.asarray(np.full(B, L, np.int32))
    qd = jnp.asarray(q)
    for name, W, fn in [
        ("banded_sw_pairs[W=64]", 64, ex.banded_sw_pairs),
        ("banded_sw_pallas[W=128]", 128, ex.banded_sw_pallas),
    ]:
        p = ex.ExtendParams(band=W)
        refwin = ex.extract_ref_windows(
            jnp.asarray(ref), jnp.asarray(starts.astype(np.int32)), L, W
        )
        s_j, ml_j = ex.banded_sw_jnp(qd, refwin, lengths, p)
        s_p, ml_p = fn(qd, refwin, lengths, p)
        ok = bool(
            (np.asarray(s_j) == np.asarray(s_p)).all()
            and (np.asarray(ml_j) == np.asarray(ml_p)).all()
        )
        results[name] = {
            "ok": ok,
            "median_score_oracle": int(np.median(np.asarray(s_j))),
            "median_score_kernel": int(np.median(np.asarray(s_p))),
        }
        print(f"{name:28s} {'OK' if ok else 'MISMATCH'}", flush=True)


def check_sortnet(results):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**32, (64, 128), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(bitonic_sort_rows(jnp.asarray(x)))
    ok = bool(np.array_equal(got, np.sort(x, axis=-1)))
    gg = np.asarray(bitonic_sort_rows(jnp.asarray(x), group=8, descending=True))
    want = np.sort(x.reshape(64, 16, 8), axis=-1)[..., ::-1].reshape(64, 128)
    ok_g = bool(np.array_equal(gg, want))
    results["bitonic_sort_rows"] = {"ok": ok}
    results["bitonic_sort_rows[group=8,desc]"] = {"ok": ok_g}
    print(f"{'bitonic_sort_rows':28s} {'OK' if ok else 'MISMATCH'}", flush=True)
    print(f"{'bitonic groupwise':28s} {'OK' if ok_g else 'MISMATCH'}", flush=True)


def main():
    out = None
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} backend={jax.default_backend()}", flush=True)
    results = {}
    t0 = time.time()
    check_sortnet(results)
    check_sw(results)
    verdict = "PASS" if all(r["ok"] for r in results.values()) else "FAIL"
    payload = {
        "device": str(dev.device_kind),
        "backend": jax.default_backend(),
        "verdict": verdict,
        "seconds": round(time.time() - t0, 1),
        "results": results,
    }
    print(json.dumps(payload))
    if out:
        with open(out, "w") as fh:
            json.dump(payload, fh, indent=1)
    sys.exit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
