"""Evaluation harness: strain-level discrimination, homopolymer-biased
simulation, repeat-bearing communities, and the product-path routing of
the harness itself (VERDICT r3 item 3 / weak #5).
"""

import numpy as np
import pytest

from monica_tpu import evaluation as ev
from monica_tpu.align import pipeline as pl
from monica_tpu.index.build import build_index_from_arrays


def test_sibling_genome_divergence():
    rng = np.random.default_rng(1)
    base = rng.integers(0, 4, 50_000).astype(np.uint8)
    sib = ev.sibling_genome(rng, base, divergence=0.03)
    # length changes only by the indel budget
    assert abs(len(sib) - len(base)) < len(base) * 0.03
    # substituted fraction is near the substitution budget (70% of 3%)
    n = min(len(sib), len(base))
    frac_diff = (sib[:n] != base[:n]).mean()
    assert 0.01 < frac_diff  # indel shifts inflate this beyond sub rate
    # zero divergence is the identity
    assert np.array_equal(ev.sibling_genome(rng, base, 0.0), base)


def test_homopolymer_mask_and_bias():
    frag = np.array([0, 0, 0, 0, 1, 2, 3, 3, 3, 1], np.uint8)
    hp = ev._homopolymer_mask(frag)
    assert hp.tolist() == [True] * 4 + [False, False] + [True] * 3 + [False]

    # hp_bias concentrates errors: a homopolymer-rich genome loses more
    # bases at hp_bias=6 than at 1 for the same nominal rates
    rng = np.random.default_rng(2)
    genome = np.repeat(rng.integers(0, 4, 2000).astype(np.uint8), 5)  # runs of 5
    r_plain = ev.simulate_read_codes(
        np.random.default_rng(3), genome, 2000, 0.0, 0.0, 0.04, False, hp_bias=1.0
    )
    r_bias = ev.simulate_read_codes(
        np.random.default_rng(3), genome, 2000, 0.0, 0.0, 0.04, False, hp_bias=6.0
    )
    assert len(r_bias) <= len(r_plain)


def test_mock_community_repeats():
    rng = np.random.default_rng(4)
    seqs = ev.mock_community(rng, 2, 40_000, tandem_repeats=2, dispersed_repeats=1)
    assert len(seqs) == 2 and all(len(s) == 40_000 for s in seqs)


def test_strain_pair_precision_gate():
    """At 97% ANI the classifier must not guess: precision 1.0-ish
    (>= 0.995 is the CONCORDANCE gate), mistakes route to
    ambiguous/unmapped (reference tie semantics, aligner.py:328-339)."""
    r = ev.strain_pair_eval(
        np.random.default_rng(5), pl.ClassifyParams(),
        genome_len=100_000, divergence=0.03, n_reads=96, read_len=1000,
    )
    assert r.n_mapped > 20
    assert r.precision >= 0.995
    # and at near-identity, calls are rare and never confidently wrong
    r2 = ev.strain_pair_eval(
        np.random.default_rng(6), pl.ClassifyParams(),
        genome_len=100_000, divergence=0.002, n_reads=96, read_len=1000,
    )
    assert r2.n_wrong <= 1
    assert r2.n_ambiguous > r2.n_mapped  # ambiguity dominates calls


def test_evaluate_routes_through_product_classifier():
    """The harness must certify the product dispatch path: evaluate()
    accepts/constructs a runtime.Classifier (packed wire, grouped
    stacking) rather than mirroring pipeline calls by hand."""
    from monica_tpu.align import runtime as rt

    rng = np.random.default_rng(7)
    seqs = ev.mock_community(rng, 3, 40_000)
    built = build_index_from_arrays(seqs, n_shards=2)
    clf = rt.Classifier(built, pl.ClassifyParams(), count_mode="basic")
    r = ev.evaluate(
        built, seqs, pl.ClassifyParams(), rng, n_reads=64, read_len=800,
        classifier=clf,
    )
    assert r.n_mapped > 40
    # tiny mock genomes put ~20% of bases in shared blocks; a noisy
    # shared-block read can slip past the cross-shard near-tie band
    # (tie_rel_tol covers vote noise at ~40 votes, not ~11), so the
    # hermetic-size bound is loose — the full-size precision gate lives
    # in scripts/concordance.py
    assert r.precision >= 0.95 and r.n_wrong <= 2
