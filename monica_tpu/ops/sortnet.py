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


def bitonic_sort_rows(
    x: jnp.ndarray, group: int | None = None, descending: bool = False
) -> jnp.ndarray:
    """Sort the last axis ascending; its length must be a power of two.

    Equivalent to ``jnp.sort(x, axis=-1)`` for any dtype with total
    order under min/max (int32 keys here).

    ``group=g`` (a power of two dividing the width) sorts each aligned
    g-element group independently — one wide-lane network instead of a
    tiny-minor-axis sort: because groups are g-aligned and every
    exchange distance j < g, the partner permutation ``idx ^ j`` never
    crosses a group boundary, so the full-width network truncated at
    k=g IS the per-group sort.  Used by ops.lookup to compact 8-slot
    hash rows without lax.sort on an 8-wide minor axis.

    Only the GROUP must be a power of two: with ``group=g`` every
    exchange distance is j < g, so the network never references lanes
    outside an aligned g-block and any width that is a multiple of g
    works (e.g. n_slots=96 rows with group=8 — a full-width
    power-of-two requirement here would reject legal slot budgets at
    trace time on TPU while CPU takes the jnp.sort branch).
    """
    A = x.shape[-1]
    g = group or A
    assert g & (g - 1) == 0 and A % g == 0, f"bad group {g} for width {A}"
    idx = np.arange(A)
    k = 2
    while k <= g:
        # intermediate stages alternate direction on bit k (the classic
        # network, building bitonic 2k-blocks); the FINAL stage k=g must
        # merge every group in the same direction — with g=A that is
        # what (idx & A)==0 already says, with g<A it must be forced or
        # odd groups come out reversed.
        up = (idx & k) == 0 if k < g else np.ones(A, bool)
        if descending:
            up = ~up
        j = k >> 1
        while j:
            partner = idx ^ j
            y = x[..., partner]
            keep_min = jnp.asarray(up == (idx < partner))
            x = jnp.where(keep_min, jnp.minimum(x, y), jnp.maximum(x, y))
            j >>= 1
        k <<= 1
    return x
