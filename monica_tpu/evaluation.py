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
) -> list[np.ndarray]:
    """Random genomes with conserved blocks copied between neighbors
    (the 16S/mobile-element analog): classification must rely on the
    unique remainder, and reads fully inside a shared block are
    genuinely ambiguous."""
    seqs = [rng.integers(0, 4, size=genome_len).astype(np.uint8) for _ in range(n_genomes)]
    for b in range(shared_blocks):
        block = rng.integers(0, 4, size=shared_len).astype(np.uint8)
        for g in range(n_genomes):
            if rng.random() < 0.5:  # each genome carries ~half the blocks
                start = int(rng.integers(0, genome_len - shared_len))
                seqs[g][start : start + shared_len] = block
    return seqs


def zymo_community(rng: np.random.Generator, scale: float = 1.0) -> list[np.ndarray]:
    """BASELINE.json config-2 analog: the ZymoBIOMICS mock community is
    8 bacteria (~2-7 Mb genomes) + 2 yeasts (~12 Mb); modeled here as
    8 × 5 Mb + 2 × 12 Mb ≈ 64 Mbase of reference."""
    sizes = [int(5e6 * scale)] * 8 + [int(12e6 * scale)] * 2
    return [rng.integers(0, 4, size=n).astype(np.uint8) for n in sizes]


def simulate_read_codes(
    rng: np.random.Generator,
    genome: np.ndarray,
    read_len: int,
    sub: float,
    ins: float,
    dele: float,
    rc: bool,
) -> np.ndarray:
    """Sample one read (as uint8 codes) with nanopore-like errors."""
    L = min(read_len + int(read_len * dele * 2) + 16, len(genome))
    start = int(rng.integers(0, len(genome) - L + 1))
    frag = genome[start : start + L]
    if rc:
        frag = (3 - frag)[::-1]
    r = rng.random(len(frag))
    keep = r >= dele
    frag = frag.copy()
    is_sub = (r >= dele) & (r < dele + sub)
    # nonzero offset mod 4 guarantees a real base change (a uniform draw
    # would reproduce the original base 25% of the time, silently
    # lowering the effective substitution rate to 0.75*sub)
    frag[is_sub] = (frag[is_sub] + rng.integers(1, 4, int(is_sub.sum()))) % 4
    frag = frag[keep]
    n_ins = rng.random(len(frag)) < ins
    if n_ins.any():
        out = np.empty(len(frag) + int(n_ins.sum()), dtype=np.uint8)
        j = 0
        ins_vals = rng.integers(0, 4, int(n_ins.sum())).astype(np.uint8)
        vi = 0
        for i, c in enumerate(frag):
            out[j] = c
            j += 1
            if n_ins[i]:
                out[j] = ins_vals[vi]
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
            precision=round(self.precision, 4),
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
) -> EvalResult:
    """Classify simulated reads against a built index; score vs truth."""
    import jax.numpy as jnp

    from monica_tpu.align import pipeline as pl

    sub, ins, dele = error
    labels = rng.integers(0, len(seqs), n_reads)
    rcs = rng.random(n_reads) < 0.5
    codes = np.full((n_reads, read_len), 4, dtype=np.uint8)
    lengths = np.zeros(n_reads, dtype=np.int32)
    for i in range(n_reads):
        r = simulate_read_codes(rng, seqs[labels[i]], read_len, sub, ins, dele, rcs[i])
        codes[i, : len(r)] = r
        lengths[i] = len(r)

    if len(built.shards) == 1:
        dev, steps = pl.device_shard(built.shards[0])
        stacked = False
    else:
        # grouped stacking = the product path (runtime.Classifier)
        dev, steps = pl.stack_device_shard_groups(built.shards)
        stacked = True
    params = params._replace(
        tag_bits=steps, k=built.meta.k, w=built.meta.w, frac=built.meta.frac
    )
    # mirror the product's per-bucket seed budget (runtime.Classifier)
    params = pl.params_for_bucket(params, read_len)

    res = EvalResult(n_reads=n_reads)
    for s0 in range(0, n_reads, batch):
        sl = slice(s0, min(s0 + batch, n_reads))
        fn = pl.classify_batch_grouped if stacked else pl.classify_batch
        out, _ = fn(
            dev,
            jnp.asarray(codes[sl]),
            jnp.asarray(lengths[sl]),
            params,
            built.meta.n_accessions,
            pl.MODE_BASIC,
        )
        st = np.asarray(out.status)
        ac = np.asarray(out.acc_id)
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
