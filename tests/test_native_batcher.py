"""Native batcher vs pure-Python batcher equivalence.

The C++ parser (kthost.cpp:FastxParser/Batcher) takes a zero-copy fast
path for single-line records and falls back to materialised records for
multi-line FASTA / buffer-spanning lines; the pure-Python stream
(io/batch.py:batch_stream over io/fastx.py) is the oracle. Both must
yield identical Batch streams on every input shape — these corpora pin
the parser's edge cases (ktio/src/seq.rs:100-131 semantics).
"""

import numpy as np
import pytest

from kmertools_tpu import native
from kmertools_tpu.io import fastx
from kmertools_tpu.io.batch import batch_stream, native_batch_stream

pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native runtime unavailable"
)


def _assert_streams_equal(path, overlap=3):
    nb = list(native_batch_stream(str(path), overlap=overlap))
    pb = list(batch_stream(fastx.sequences(str(path)), overlap=overlap))
    assert len(nb) == len(pb)
    for a, b in zip(nb, pb):
        assert np.array_equal(a.codes, b.codes)
        assert np.array_equal(a.lengths, b.lengths)
        assert np.array_equal(a.read_idx, b.read_idx)
        assert np.array_equal(a.row_start, b.row_start)
        assert np.array_equal(a.last_row, b.last_row)
        assert a.ids == b.ids
        assert a.read_lengths == b.read_lengths


def test_multiline_fasta(tmp_path):
    """Wrapped FASTA (60/7/1-col lines) exercises the multi-line
    reclaim path: the zero-copy row translate is undone and the record
    finishes via the materialised path."""
    p = tmp_path / "wrapped.fa"
    rng = np.random.default_rng(0)
    with open(p, "wb") as f:
        for i, wrap in enumerate((60, 7, 1, 133)):
            seq = rng.choice(list(b"ACGT"), size=500).astype(np.uint8)
            f.write(b">r%d some description\n" % i)
            for s in range(0, len(seq), wrap):
                f.write(seq[s : s + wrap].tobytes() + b"\n")
    _assert_streams_equal(p)


def test_crlf_line_endings(tmp_path):
    p = tmp_path / "crlf.fa"
    p.write_bytes(b">a desc\r\nACGTACGTAC\r\nGGTT\r\n>b\r\nacgtu\r\n")
    _assert_streams_equal(p)


def test_empty_fasta_records(tmp_path):
    """Headers with no sequence — mid-file and at EOF."""
    p = tmp_path / "empty.fa"
    p.write_bytes(b">a\n>b\nACGT\n>c\n")
    _assert_streams_equal(p)


def test_fasta_no_trailing_newline(tmp_path):
    p = tmp_path / "notrail.fa"
    p.write_bytes(b">a\nACGTAC\n>b\nGGTTAA")
    _assert_streams_equal(p)


def test_fasta_junk_preheader(tmp_path):
    p = tmp_path / "junk.fa"
    p.write_bytes(b"; comment line\n\n>a\nACGT\n")
    _assert_streams_equal(p)


def test_fastq_blank_lines_between_records(tmp_path):
    p = tmp_path / "blank.fq"
    p.write_bytes(
        b"@r1 d\nACGTN\n+\nIIIII\n\n\n@r2\nggttaa\n+\nIIIIII\n"
    )
    _assert_streams_equal(p)


def test_fastq_truncated_record_dropped(tmp_path):
    """A final record missing its quality line is dropped, matching
    Sequences::next (ktio/src/seq.rs:100-131 unwraps -> iteration end)."""
    p = tmp_path / "trunc.fq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n@r2\nGGTT\n+\n")
    _assert_streams_equal(p)


def test_line_spanning_read_buffer(tmp_path):
    """A single-line read longer than the reader's 1 MB buffer takes the
    spill path AND the long-read row-splitting path."""
    p = tmp_path / "huge.fa"
    rng = np.random.default_rng(1)
    big = rng.choice(list(b"ACGTN"), size=(3 << 20) + 17).astype(np.uint8)
    with open(p, "wb") as f:
        f.write(b">big\n" + big.tobytes() + b"\n")
        f.write(b">tail\nACGT\n")
    _assert_streams_equal(p)


def test_mixed_case_and_ambiguity(tmp_path):
    p = tmp_path / "mixed.fa"
    p.write_bytes(b">a\nacgtACGTuUnNxX-129\n")
    _assert_streams_equal(p)


def test_gzip_path(tmp_path):
    import gzip

    p = tmp_path / "reads.fa.gz"
    with gzip.open(p, "wb") as f:
        f.write(b">a\nACGTACGT\nGGTT\n>b\nacgt\n")
    _assert_streams_equal(p)


def test_seq_stats_matches_python(tmp_path):
    """kt_seq_stats (translation-free stat_next path) vs the Python
    oracle on a mixed corpus."""
    p = tmp_path / "mix.fa"
    rng = np.random.default_rng(2)
    with open(p, "wb") as f:
        for i in range(50):
            L = int(rng.integers(0, 300))
            seq = rng.choice(list(b"ACGTN"), size=L).astype(np.uint8)
            f.write(b">r%d\n" % i)
            for s in range(0, L, 80):
                f.write(seq[s : s + 80].tobytes() + b"\n")
            if L == 0:
                f.write(b"\n")
    st = fastx.seq_stats(str(p))
    count = total = 0
    for rec in fastx.sequences(str(p)):
        count += 1
        total += len(rec.seq)
    assert (st.seq_count, st.total_length) == (count, total)


def test_radix_argsort_matches_numpy_stable():
    """kt_radix_argsort_u64 must produce EXACTLY numpy's stable argsort
    permutation (the m2s output contract relies on stability: records
    pre-ordered by (read, start) sort by value only)."""
    from kmertools_tpu import native
    from kmertools_tpu.workloads.minimisers import _stable_argsort_u64

    so = native.lib()
    if so is None:
        import pytest

        pytest.skip("native runtime unavailable")
    rng = np.random.default_rng(3)
    for n, bits in ((1 << 15, 20), (100_000, 20), (70_000, 62), (1 << 15, 1)):
        a = rng.integers(0, 1 << min(bits, 62), size=n).astype(np.uint64)
        # heavy duplication so stability is actually exercised
        a[: n // 2] = a[0]
        got = _stable_argsort_u64(a, bits)
        want = np.argsort(a, kind="stable")
        assert np.array_equal(got, want), (n, bits)
