#!/usr/bin/env python
"""Isolate per-gather-op vs per-element cost inside one fused program.

Times K independent elem-gathers of E elements each, inside a scan(R)
(distinct indices per iteration defeat LICM), R=16 amortizes dispatch.
"""
import sys, time
sys.path.insert(0, ".")
import numpy as np

R = 16
def main():
    import jax, jax.numpy as jnp
    M = 1_000_000
    tbl = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 31, M, dtype=np.int32))
    rng = np.random.default_rng(1)

    def run(K, E, dependent=False):
        idx = jnp.asarray(rng.integers(0, M, (R, K, E), dtype=np.int32))
        def step(c, x):
            if dependent:
                v = x[0]
                for _ in range(K):
                    v = tbl[(v & 0x7FFFF) % M]
                return c + v.astype(jnp.float32).sum(), None
            else:
                s = c
                for k in range(K):
                    s = s + tbl[x[k]].astype(jnp.float32).sum()
                return s, None
        f = jax.jit(lambda xs: jax.lax.scan(step, jnp.float32(0), xs)[0])
        np.asarray(f(idx)); t0 = time.time(); np.asarray(f(idx))
        dt = (time.time() - t0) / R * 1000
        tag = "dep" if dependent else "ind"
        print(f"K={K:2d} E={E:8d} {tag}: {dt:8.3f} ms/iter  ({dt*1e6/(K*E):6.1f} ns/elem)")

    for K, E in [(1, 2048), (1, 262144), (2, 262144), (4, 262144), (8, 262144),
                 (1, 2097152), (1, 524288), (4, 65536), (8, 65536)]:
        run(K, E)
    run(4, 262144, dependent=True)
    run(8, 262144, dependent=True)

if __name__ == "__main__":
    main()
