#!/usr/bin/env python
"""Primitive gather cost model on TPU (honest: scan over distinct xs)."""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

N = 8  # batches


def main():
    import jax
    import jax.numpy as jnp

    M = 1_000_000
    tbl = jnp.asarray(np.random.default_rng(0).integers(0, 1 << 31, M, dtype=np.int32))
    rng = np.random.default_rng(1)

    def timed(name, fn, xs):
        f = jax.jit(fn)
        out = f(xs)
        np.asarray(out)
        t0 = time.time()
        np.asarray(f(xs))
        dt = (time.time() - t0) / N * 1000
        print(f"{name:44s}: {dt:8.2f} ms/iter")

    def scan_sum(body):
        def fn(xs):
            def step(c, x):
                return c + body(x).astype(jnp.float32).sum(), None
            tot, _ = jax.lax.scan(step, jnp.float32(0), xs)
            return tot
        return fn

    for shape, label in [
        ((2048, 128), "elem gather (2048,128)=262k"),
        ((2048, 1024), "elem gather (2048,1024)=2M"),
        ((2048, 128, 8), "elem gather (2048,128,8)=2M"),
        ((16384, 128), "elem gather (16384,128)=2M"),
        ((2048,), "elem gather (2048,)"),
    ]:
        idx = jnp.asarray(rng.integers(0, M, (N, *shape), dtype=np.int32))
        timed(label, scan_sum(lambda x: tbl[x]), idx)

    # dependent chain: 4 rounds of 262k
    idx = jnp.asarray(rng.integers(0, M, (N, 2048, 128), dtype=np.int32))
    def chain4(x):
        v = x
        for _ in range(4):
            v = (tbl[v] & 0x7FFFF) % M
        return v
    timed("4-dep-chain elem gather 262k", scan_sum(chain4), idx)

    # slice gather 16 contiguous per seed, 262k seeds
    from monica_tpu.ops.lookup import _row_gather
    idx = jnp.asarray(rng.integers(0, M - 16, (N, 2048, 128), dtype=np.int32))
    timed("slice gather 16x (2048,128) desc", scan_sum(lambda x: _row_gather(tbl, x, 16)), idx)
    timed("slice gather 2x (2048,128) desc", scan_sum(lambda x: _row_gather(tbl, x, 2)), idx)

    # one-hot matmul "gather" for a small table (1024 entries) — MXU path
    small = jnp.asarray(rng.integers(0, 1 << 30, 1024, dtype=np.int32)).astype(jnp.float32)
    idx = jnp.asarray(rng.integers(0, 1024, (N, 2048, 128), dtype=np.int32))
    def onehot_mm(x):
        oh = jax.nn.one_hot(x.reshape(-1, 128), 1024, dtype=jnp.bfloat16)
        return jnp.einsum("bk,k->b", oh.reshape(-1, 1024), small.astype(jnp.bfloat16))
    timed("one-hot matmul small-table 262k", scan_sum(onehot_mm), idx)

    # take_along_axis within rows: table rows (2048, 1024), idx (2048,128)
    tbl2 = jnp.asarray(rng.integers(0, 1 << 30, (2048, 1024), dtype=np.int32))
    idx = jnp.asarray(rng.integers(0, 1024, (N, 2048, 128), dtype=np.int32))
    timed("take_along_axis rows 262k", scan_sum(lambda x: jnp.take_along_axis(tbl2, x, axis=1)), idx)


if __name__ == "__main__":
    main()
