"""Native C++ ingest (fastq indexer + encoder) vs the Python parser."""

import gzip

import numpy as np
import pytest

from monica_tpu.io import native, seq as seqio
from monica_tpu.io.encode import encode_seq, PAD_CODE
from tests.fixtures import make_fastq, random_genome

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)"
)


def _sample_bytes(n=50, seed=5):
    rng = np.random.default_rng(seed)
    seqs = [random_genome(rng, int(rng.integers(50, 400))) for _ in range(n)]
    lines = []
    for i, s in enumerate(seqs):
        lines.append(f"@read{i} extra info\n{s}\n+\n{'I' * len(s)}\n")
    return "".join(lines).encode(), seqs


def test_index_matches_python_parser(tmp_path):
    buf, seqs = _sample_bytes()
    path = tmp_path / "s.fastq"
    path.write_bytes(buf)
    view = native.parse_fastq_file(path)
    py = list(seqio.read_fastq(path))
    assert len(view) == len(py) == len(seqs)
    for i, rec in enumerate(py):
        assert view.read_id(i).decode() == rec.id
        o, l = view.seq_off[i], view.seq_len[i]
        assert buf[o : o + l].decode() == rec.seq
        # full record roundtrip
        assert view.record_bytes(i).decode().startswith(f"@read{i} ")


def test_gzip_and_crlf_and_malformed(tmp_path):
    buf, _ = _sample_bytes(5)
    gz = tmp_path / "s.fastq.gz"
    with gzip.open(gz, "wb") as fh:
        fh.write(buf)
    assert len(native.parse_fastq_file(gz)) == 5

    crlf = buf.replace(b"\n", b"\r\n")
    view = native.parse_fastq_bytes(crlf)
    assert len(view) == 5
    # CRLF must not leak into sequence spans
    o, l = view.seq_off[0], view.seq_len[0]
    assert b"\r" not in crlf[o : o + l]

    with pytest.raises(ValueError):
        native.parse_fastq_bytes(b">fasta not fastq\nACGT\n")


def test_encode_rows_matches_python(tmp_path):
    buf, seqs = _sample_bytes(20, seed=6)
    view = native.parse_fastq_bytes(buf)
    idx = np.asarray([3, 0, 7, 19], np.int64)
    L = 256
    out = np.full((len(idx), L), PAD_CODE, np.uint8)
    view.encode_rows(idx, out)
    for row, i in enumerate(idx):
        expect = encode_seq(seqs[i])[:L]
        np.testing.assert_array_equal(out[row, : len(expect)], expect)
        assert np.all(out[row, len(expect):] == PAD_CODE)


def test_record_with_id_rewrite():
    buf, _ = _sample_bytes(3)
    view = native.parse_fastq_bytes(buf)
    rec = view.record_with_id(1, b"Species_X")
    # new id prepended, original id kept (biopython title rule the
    # reference's rewrite goes through — see monica_tpu/parity.py)
    assert rec.startswith(b"@Species_X read1 extra info\n")


def test_runtime_native_equals_python(tmp_path, monkeypatch):
    """End-to-end: the native-ingest runtime must produce identical
    routing and counts to the pure-Python path."""
    from monica_tpu.align import pipeline as pl, runtime as rt
    from monica_tpu.index.build import build_index
    from monica_tpu.stats.abundance import AbundanceState
    from tests.fixtures import make_fasta_gz, sample_reads

    rng = np.random.default_rng(9)
    seqs, genomes = [], []
    for i in range(2):
        g = random_genome(rng, 20_000)
        seqs.append(g)
        p = tmp_path / f"g{i}.fna.gz"
        make_fasta_gz(p, [(f"c{i}", g)])
        genomes.append((str(p), [f"Sp_{i}", f"A{i}.1"]))
    built = build_index(genomes, n_shards=1)
    clf = rt.Classifier(built, pl.ClassifyParams(n_slots=64), count_mode="basic")
    reads, _ = sample_reads(rng, seqs, 24, read_len=400, error=(0.03, 0.01, 0.01))

    results = {}
    for label in ("native", "python"):
        q = tmp_path / f"q_{label}"
        out = tmp_path / f"o_{label}"
        q.mkdir()
        make_fastq(q / "s.fastq", reads)
        if label == "python":
            monkeypatch.setattr(native, "available", lambda: False)
        rep = rt.run_once(clf, q, out)[0]
        state = AbundanceState.load(out, built.meta.n_accessions)
        mapped = (q / "mapped" / "s.fastq").read_bytes()
        results[label] = (rep.n_mapped, rep.n_unmapped, state.samples["s"].tolist(), mapped)

    assert results["native"][0] == results["python"][0]
    assert results["native"][1] == results["python"][1]
    assert results["native"][2] == results["python"][2]
    assert results["native"][3] == results["python"][3]


def test_window_plan_edges():
    from monica_tpu.io import encode as enc

    # short reads: one row each, grouped by bucket
    plan = enc.window_plan([100, 600, 5000])
    rows = {i: [] for i in range(3)}
    for blen, batch in plan:
        for i, off, w in batch:
            rows[i].append((blen, off, w))
    assert rows[0] == [(512, 0, 100)]
    assert rows[1] == [(1024, 0, 600)]
    assert rows[2] == [(8192, 0, 5000)]

    # 32768+100: trailing 100 bp window dropped (< MIN_TAIL)
    plan = enc.window_plan([32768 + 100])
    all_rows = [r for _, b in plan for r in b]
    assert all_rows == [(0, 0, 32768)]

    # 32768+300: tail kept, lands in the smallest bucket
    plan = enc.window_plan([32768 + 300])
    all_rows = sorted(r for _, b in plan for r in b)
    assert all_rows == [(0, 0, 32768), (0, 32768, 300)]

    # max_batch splits within a bucket
    plan = enc.window_plan([500] * 7, max_batch=3)
    sizes = [len(b) for _, b in plan]
    assert sizes == [3, 3, 1]


def test_concat_records_empty_and_order(tmp_path):
    import numpy as np

    from monica_tpu.io import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    buf = b"@a x\nACGT\n+\nIIII\n@b\nGG\n+\nII\n@c\nTTT\n+\nIII\n"
    v = native.parse_fastq_bytes(buf)
    assert bytes(v.concat_records(np.array([], np.int64))) == b""
    out = bytes(v.concat_records(np.array([2, 0], np.int64)))
    assert out == b"@c\nTTT\n+\nIII\n@a x\nACGT\n+\nIIII\n"
    rid = bytes(v.concat_records_with_id(np.array([0, 1], np.int64), b"Tax_X"))
    assert rid == b"@Tax_X a x\nACGT\n+\nIIII\n@Tax_X b\nGG\n+\nII\n"
