"""Accuracy / concordance harness.

BASELINE.md's first target is >=95% read-assignment concordance with
the reference pipeline.  The reference's mappy/minimap2 CPU path is not
runnable in this environment, so the harness measures what that
concordance is a proxy for: ground-truth assignment accuracy on
simulated nanopore-like reads (known origin genome, known error rate)
over a mock community — including *conserved regions shared between
genomes*, which is what makes real classification hard and exercises
the ambiguous-read semantics (`monica/genomes/aligner.py:328-339`
resolves exact ties as ambiguous rather than guessing).

Every performance knob (minimizer scaling, seed slots, hits per seed)
must be validated against this harness before it changes a default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def mock_community(
    rng: np.random.Generator,
    n_genomes: int,
    genome_len: int,
    shared_blocks: int = 4,
    shared_len: int = 2000,
    tandem_repeats: int = 0,
    dispersed_repeats: int = 0,
) -> list[np.ndarray]:
    """Random genomes with conserved blocks copied between neighbors
    (the 16S/mobile-element analog): classification must rely on the
    unique remainder, and reads fully inside a shared block are
    genuinely ambiguous.

    ``tandem_repeats``: per genome, this many loci where a 100-400 bp
    unit is repeated 4-12 times in place (rRNA-operon / satellite
    analog — stresses the repetitive-seed cut and diagonal voting).
    ``dispersed_repeats``: per genome, this many 500-1500 bp blocks
    copied to 3 extra random locations IN THE SAME genome (IS-element
    analog — a read inside one has multiple equal within-genome loci,
    which must NOT become cross-genome ambiguity)."""
    seqs = [rng.integers(0, 4, size=genome_len).astype(np.uint8) for _ in range(n_genomes)]
    for b in range(shared_blocks):
        block = rng.integers(0, 4, size=shared_len).astype(np.uint8)
        for g in range(n_genomes):
            if rng.random() < 0.5:  # each genome carries ~half the blocks
                start = int(rng.integers(0, genome_len - shared_len))
                seqs[g][start : start + shared_len] = block
    for g in range(n_genomes):
        for _ in range(tandem_repeats):
            unit = rng.integers(0, 4, size=int(rng.integers(100, 400))).astype(np.uint8)
            n_copies = int(rng.integers(4, 13))
            span = len(unit) * n_copies
            if span < genome_len:
                start = int(rng.integers(0, genome_len - span))
                seqs[g][start : start + span] = np.tile(unit, n_copies)
        for _ in range(dispersed_repeats):
            blen = int(rng.integers(500, 1500))
            src = int(rng.integers(0, genome_len - blen))
            block = seqs[g][src : src + blen].copy()
            for _ in range(3):
                dst = int(rng.integers(0, genome_len - blen))
                seqs[g][dst : dst + blen] = block
    return seqs


def sibling_genome(
    rng: np.random.Generator,
    base: np.ndarray,
    divergence: float,
    indel_frac: float = 0.3,
) -> np.ndarray:
    """A strain/near-species sibling at the given divergence (ANI =
    1 - divergence): point substitutions plus short 1-3 bp indels —
    the E. coli-vs-Shigella-style near neighbor (~97% ANI) that real
    classification must either discriminate or route to AMBIGUOUS
    (reference tie semantics, `aligner.py:328-339`)."""
    n = len(base)
    n_events = int(n * divergence)
    out = base.copy()
    n_sub = int(n_events * (1.0 - indel_frac))
    if n_sub:
        pos = rng.choice(n, size=n_sub, replace=False)
        # +1..3 mod 4 guarantees a real base change
        out[pos] = (out[pos] + rng.integers(1, 4, n_sub)) % 4
    n_indel_bases = n_events - n_sub
    if n_indel_bases <= 0:
        return out
    parts = []
    cursor = 0
    budget = n_indel_bases
    # alternate short deletions and insertions along the genome
    sites = np.sort(rng.choice(n - 8, size=max(n_indel_bases // 2, 1), replace=False))
    for i, s in enumerate(sites):
        if budget <= 0 or s <= cursor:
            continue
        ln = int(rng.integers(1, 4))
        parts.append(out[cursor:s])
        if i % 2 == 0:  # deletion
            cursor = s + ln
        else:  # insertion
            parts.append(rng.integers(0, 4, ln).astype(np.uint8))
            cursor = s
        budget -= ln
    parts.append(out[cursor:])
    return np.concatenate(parts)


def zymo_community(rng: np.random.Generator, scale: float = 1.0) -> list[np.ndarray]:
    """BASELINE.json config-2 analog: the ZymoBIOMICS mock community is
    8 bacteria (~2-7 Mb genomes) + 2 yeasts (~12 Mb); modeled here as
    8 × 5 Mb + 2 × 12 Mb ≈ 64 Mbase of reference."""
    sizes = [int(5e6 * scale)] * 8 + [int(12e6 * scale)] * 2
    return [rng.integers(0, 4, size=n).astype(np.uint8) for n in sizes]


def _homopolymer_mask(frag: np.ndarray, min_run: int = 3) -> np.ndarray:
    """True at positions inside a homopolymer run of >= min_run."""
    if len(frag) == 0:
        return np.zeros(0, bool)
    starts = np.flatnonzero(np.concatenate([[True], frag[1:] != frag[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(frag)]]))
    return np.repeat(lens >= min_run, lens)


def simulate_read_codes(
    rng: np.random.Generator,
    genome: np.ndarray,
    read_len: int,
    sub: float,
    ins: float,
    dele: float,
    rc: bool,
    hp_bias: float = 1.0,
) -> np.ndarray:
    """Sample one read (as uint8 codes) with nanopore-like errors.

    ``hp_bias`` > 1 concentrates indels in homopolymer runs (>= 3),
    the dominant real nanopore error mode (R9/R10 basecallers
    under/over-call run lengths): positions inside a run get their
    ins/del probability multiplied by hp_bias, everywhere else the
    base rates apply — total error therefore RISES with hp_bias the
    way real homopolymer-rich genomes are genuinely harder."""
    L = min(read_len + int(read_len * dele * 2) + 16, len(genome))
    start = int(rng.integers(0, len(genome) - L + 1))
    frag = genome[start : start + L]
    if rc:
        frag = (3 - frag)[::-1]
    hp = _homopolymer_mask(frag)
    p_del = np.where(hp, np.minimum(dele * hp_bias, 0.5), dele)
    r = rng.random(len(frag))
    keep = r >= p_del
    frag = frag.copy()
    is_sub = (r >= p_del) & (r < p_del + sub)
    # nonzero offset mod 4 guarantees a real base change (a uniform draw
    # would reproduce the original base 25% of the time, silently
    # lowering the effective substitution rate to 0.75*sub)
    frag[is_sub] = (frag[is_sub] + rng.integers(1, 4, int(is_sub.sum()))) % 4
    hp = hp[keep]
    frag = frag[keep]
    p_ins = np.where(hp, np.minimum(ins * hp_bias, 0.5), ins)
    n_ins = rng.random(len(frag)) < p_ins
    if n_ins.any():
        out = np.empty(len(frag) + int(n_ins.sum()), dtype=np.uint8)
        j = 0
        ins_vals = rng.integers(0, 4, int(n_ins.sum())).astype(np.uint8)
        vi = 0
        for i, c in enumerate(frag):
            out[j] = c
            j += 1
            if n_ins[i]:
                # homopolymer insertions duplicate the run base (the
                # real over-call mode); elsewhere a random base
                out[j] = c if hp[i] else ins_vals[vi]
                j += 1
                vi += 1
        frag = out
    return frag[:read_len]


@dataclass
class EvalResult:
    n_reads: int
    n_mapped: int = 0
    n_correct: int = 0
    n_wrong: int = 0
    n_ambiguous: int = 0
    n_unmapped: int = 0
    settings: dict = field(default_factory=dict)

    @property
    def accuracy(self) -> float:
        """Fraction of ALL reads assigned to their true genome."""
        return self.n_correct / max(self.n_reads, 1)

    @property
    def precision(self) -> float:
        """Fraction of MAPPED reads assigned correctly (the direct
        analog of per-read assignment concordance among calls)."""
        return self.n_correct / max(self.n_mapped, 1)

    def row(self) -> dict:
        return dict(
            **self.settings,
            reads=self.n_reads,
            accuracy=round(self.accuracy, 4),
            # no calls -> precision is undefined, not zero (an all-
            # ambiguous outcome on a near-identical pair is CORRECT)
            precision=round(self.precision, 4) if self.n_mapped else None,
            mapped=self.n_mapped,
            wrong=self.n_wrong,
            ambiguous=self.n_ambiguous,
            unmapped=self.n_unmapped,
        )


def evaluate(
    built,
    seqs: list[np.ndarray],
    params,
    rng: np.random.Generator,
    n_reads: int = 512,
    read_len: int = 1000,
    error: tuple[float, float, float] = (0.05, 0.03, 0.03),
    batch: int = 512,
    hp_bias: float = 1.0,
    classifier=None,
) -> EvalResult:
    """Classify simulated reads against a built index; score vs truth.

    Runs through :class:`runtime.Classifier` — the PRODUCT dispatch
    path (packed wire format, grouped stacking, per-bucket params) —
    so the harness certifies the same code users run, not a parallel
    mirror of it (VERDICT r3 weak #5)."""
    from monica_tpu.align import pipeline as pl
    from monica_tpu.align import runtime as rt

    sub, ins, dele = error
    labels = rng.integers(0, len(seqs), n_reads)
    rcs = rng.random(n_reads) < 0.5
    codes = np.full((n_reads, read_len), 4, dtype=np.uint8)
    lengths = np.zeros(n_reads, dtype=np.int32)
    for i in range(n_reads):
        r = simulate_read_codes(
            rng, seqs[labels[i]], read_len, sub, ins, dele, rcs[i],
            hp_bias=hp_bias,
        )
        codes[i, : len(r)] = r
        lengths[i] = len(r)

    clf = classifier or rt.Classifier(built, params, count_mode="basic")

    res = EvalResult(n_reads=n_reads)
    for s0 in range(0, n_reads, batch):
        sl = slice(s0, min(s0 + batch, n_reads))
        out, counts = clf.classify(codes[sl], lengths[sl])
        st, ac, _ml, _c = clf.fetch(out, counts)
        for r, lab in enumerate(labels[sl]):
            if st[r] == pl.MAPPED:
                res.n_mapped += 1
                if ac[r] == lab:
                    res.n_correct += 1
                else:
                    res.n_wrong += 1
            elif st[r] == pl.AMBIGUOUS:
                res.n_ambiguous += 1
            else:
                res.n_unmapped += 1
    return res


def strain_pair_eval(
    rng: np.random.Generator,
    params,
    genome_len: int = 1_000_000,
    divergence: float = 0.03,
    n_reads: int = 512,
    read_len: int = 1000,
    error: tuple[float, float, float] = (0.05, 0.03, 0.03),
    hp_bias: float = 1.0,
) -> EvalResult:
    """Strain discrimination at a given ANI: a base genome and its
    sibling at ``divergence`` (ANI = 1 - divergence) indexed together;
    reads drawn from both.  At high ANI correct discrimination becomes
    impossible for many reads and the RIGHT behavior is AMBIGUOUS, not
    a guess — precision (correct / mapped) is the gated metric
    (reference tie semantics, `aligner.py:328-339`)."""
    from monica_tpu.index.build import build_index_from_arrays

    base = rng.integers(0, 4, genome_len).astype(np.uint8)
    sib = sibling_genome(rng, base, divergence)
    built = build_index_from_arrays(
        [base, sib], tax_units=["Base_sp", "Sibling_sp"]
    )
    res = evaluate(
        built, [base, sib], params, rng,
        n_reads=n_reads, read_len=read_len, error=error, hp_bias=hp_bias,
    )
    res.settings = dict(
        kind="strain_pair", ani=round(1.0 - divergence, 4),
        genome_len=genome_len, read_len=read_len,
        error=error, hp_bias=hp_bias,
    )
    return res
