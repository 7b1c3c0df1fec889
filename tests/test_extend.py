"""Banded Smith–Waterman extension: jnp + Pallas(interpret) vs a
straightforward numpy DP oracle, and end-to-end refinement sanity."""

import numpy as np
import pytest

import jax.numpy as jnp

from monica_tpu.ops import extend as ex


def gold_banded_sw(q, ref, diag, band, p: ex.ExtendParams):
    """O(L·W) scalar DP, same band geometry as the kernel: cell (i, d)
    aligns read base i to ref[diag - band//2 + i + d]."""
    L = len(q)
    W = band
    base = diag - W // 2
    H = np.zeros(W, np.int64)
    M = np.zeros(W, np.int64)
    best, bm = 0, 0
    for i in range(L):
        nh = np.zeros(W, np.int64)
        nm = np.zeros(W, np.int64)
        for d in range(W):
            j = base + i + d
            r = ref[j] if 0 <= j < len(ref) else 4
            is_m = q[i] == r and q[i] < 4
            sub = p.match if is_m else -p.mismatch
            cd, md = H[d] + sub, M[d] + (1 if is_m else 0)
            cu = (H[d + 1] - p.gap, M[d + 1]) if d + 1 < W else (-(1 << 30), 0)
            t, mt = (cu if cu[0] > cd else (cd, md))
            if t < 0:
                t, mt = 0, 0
            if d > 0 and nh[d - 1] - p.gap > t:
                t, mt = nh[d - 1] - p.gap, nm[d - 1]
            nh[d], nm[d] = t, mt
        H, M = nh, nm
        rb = H.max()
        if rb > best:
            best, bm = int(rb), int(M[H.argmax()])
    return best, bm


def _mutate(rng, seq, sub, ins, dele):
    out = []
    for c in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.integers(0, 4))
        if r < dele + ins + sub:
            out.append((c + 1 + rng.integers(0, 3)) % 4)
        else:
            out.append(c)
    return np.asarray(out, np.uint8)


@pytest.mark.parametrize("impl", ["jnp", "pallas"])
def test_banded_sw_matches_gold(impl):
    rng = np.random.default_rng(0)
    W, L = 32, 96
    p = ex.ExtendParams(band=W)
    B = 5
    ref = rng.integers(0, 4, 4000).astype(np.uint8)
    qs, diags, lens = [], [], []
    for b in range(B):
        start = int(rng.integers(0, 3000))
        ln = int(rng.integers(60, L))
        q = _mutate(rng, ref[start : start + ln], 0.05, 0.02, 0.02)[:L]
        qs.append(np.pad(q, (0, L - len(q)), constant_values=4))
        lens.append(len(q))
        diags.append(start)
    q = np.stack(qs)
    lens = np.asarray(lens, np.int32)
    diags = np.asarray(diags, np.int32)

    refwin = ex.extract_ref_windows(jnp.asarray(ref), jnp.asarray(diags), L, W)
    if impl == "pallas":
        score, mlen = ex.banded_sw_pallas(
            jnp.asarray(q), refwin, jnp.asarray(lens), p, block_reads=8, interpret=True
        )
    else:
        score, mlen = ex.banded_sw_jnp(jnp.asarray(q), refwin, jnp.asarray(lens), p)
    score, mlen = np.asarray(score), np.asarray(mlen)

    for b in range(B):
        gs, gm = gold_banded_sw(q[b][: lens[b]], ref, int(diags[b]), W, p)
        assert score[b] == gs, f"read {b}: score {score[b]} != gold {gs}"
        assert mlen[b] == gm, f"read {b}: mlen {mlen[b]} != gold {gm}"


def test_orient_reads_revcomp():
    codes = np.array([[0, 1, 2, 3, 4, 4]], np.uint8)  # ACGT--
    out = ex.orient_reads(jnp.asarray(codes), jnp.asarray([4]), jnp.asarray([True]))
    # revcomp(ACGT) = ACGT
    np.testing.assert_array_equal(np.asarray(out)[0, :4], [0, 1, 2, 3])
    assert np.all(np.asarray(out)[0, 4:] == 4)


def test_extend_hits_identity_perfect_vs_noisy():
    rng = np.random.default_rng(1)
    ref = rng.integers(0, 4, 8000).astype(np.uint8)
    L, W = 128, 32
    p = ex.ExtendParams(band=W)
    start = 1000
    clean = ref[start : start + L].copy()
    noisy = _mutate(rng, clean, 0.10, 0.0, 0.0)[:L]
    q = np.stack([clean, np.pad(noisy, (0, L - len(noisy)), constant_values=4)])
    lens = np.asarray([L, len(noisy)], np.int32)
    res = ex.extend_hits(
        jnp.asarray(ref),
        jnp.asarray(q),
        jnp.asarray(lens),
        rep_ref_pos=jnp.asarray([start + 10, start + 10]),
        rep_read_pos=jnp.asarray([10, 10]),
        rc=jnp.asarray([False, False]),
        k=15,
        p=p,
        impl="jnp",
    )
    inv = np.asarray(res.inv_identity)
    assert inv[0] == 0.0  # perfect read: NM = 0
    assert inv[1] > 0.05  # 10% substitutions detected
    assert int(res.mlen[0]) == L


@pytest.mark.parametrize("B,L", [(7, 300), (16, 1000)])
def test_pairs_kernel_matches_jnp(B, L):
    """Two-reads-per-row kernel (band<=64, parity-interleaved) computes
    the exact packed-DP result, including odd batch sizes and short
    reads."""
    rng = np.random.default_rng(5)
    W = 64
    p = ex.ExtendParams(band=W)
    ref = rng.integers(0, 4, 50_000).astype(np.uint8)
    starts = rng.integers(0, len(ref) - L - W, B)
    q = np.stack([ref[s : s + L] for s in starts])
    m = rng.random(q.shape) < 0.1
    q[m] = rng.integers(0, 4, int(m.sum()))
    lengths = np.full(B, L, np.int32)
    lengths[0] = L // 3
    q[0, L // 3 :] = 4
    refwin = ex.extract_ref_windows(
        jnp.asarray(ref), jnp.asarray(starts.astype(np.int32)), L, W
    )
    s1, m1 = ex.banded_sw_jnp(jnp.asarray(q), refwin, jnp.asarray(lengths), p)
    s2, m2 = ex.banded_sw_pairs(
        jnp.asarray(q), refwin, jnp.asarray(lengths), p, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
