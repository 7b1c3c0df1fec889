"""Row-wise bitonic sorting network.

``jax.lax.sort`` lowers to a generic variadic comparator sort that is
the single most expensive op in the chain stage at realistic index
sizes.  For the chain stage's fixed power-of-two row width (B, A) the
full bitonic network is a better fit for the TPU VPU: every stage is a
STATIC lane permutation (x[..., idx ^ j]) followed by elementwise
min/max/select, which XLA fuses into a handful of vector passes — no
comparator calls, no dynamic control flow.  log2(A)·(log2(A)+1)/2
stages total (45 for A=512).

Used by :mod:`monica_tpu.ops.chain` (sort of packed diagonal keys);
benchmarked in scripts/profile_stages.py / bench.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bitonic_sort_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Sort the last axis ascending; its length must be a power of two.

    Equivalent to ``jnp.sort(x, axis=-1)`` for any dtype with total
    order under min/max (int32 keys here).
    """
    A = x.shape[-1]
    assert A & (A - 1) == 0, f"row width {A} not a power of two"
    idx = np.arange(A)
    k = 2
    while k <= A:
        j = k >> 1
        while j:
            partner = idx ^ j
            y = x[..., partner]
            keep_min = jnp.asarray((idx & k) == 0) == jnp.asarray(idx < partner)
            x = jnp.where(keep_min, jnp.minimum(x, y), jnp.maximum(x, y))
            j >>= 1
        k <<= 1
    return x
