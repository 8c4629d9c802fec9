"""Golden-file parity for the oligo workload
(composition/src/oligo.rs:311-432 test suite equivalents)."""

import numpy as np

from kmertools_tpu.workloads.oligo import OligoComputer


def test_oligo_norm_golden(tmp_path, test_data):
    out = tmp_path / "computed_fa.kmers"
    com = OligoComputer(str(test_data / "reads.fq"), str(out), 4, True)
    com.vectorise()
    assert out.read_bytes() == (test_data / "expected_fa.kmers").read_bytes()


def test_oligo_norm_golden_fasta(tmp_path, test_data):
    out = tmp_path / "computed_fa2.kmers"
    com = OligoComputer(str(test_data / "reads.fa"), str(out), 4, True)
    com.vectorise()
    assert out.read_bytes() == (test_data / "expected_fa.kmers").read_bytes()


def test_oligo_norm_golden_gz(tmp_path, test_data):
    out = tmp_path / "computed_gz.kmers"
    com = OligoComputer(str(test_data / "reads.fq.gz"), str(out), 4, True)
    com.vectorise()
    assert out.read_bytes() == (test_data / "expected_fa.kmers").read_bytes()


def test_oligo_unnorm_golden(tmp_path, test_data):
    out = tmp_path / "computed_unnorm.kmers"
    com = OligoComputer(str(test_data / "reads.fq"), str(out), 4, True)
    com.set_norm(False)
    com.vectorise()
    assert out.read_bytes() == (test_data / "expected_fa_batch_unnorm.kmers").read_bytes()


def test_oligo_header_golden(tmp_path, test_data):
    out = tmp_path / "computed_header.kmers"
    com = OligoComputer(str(test_data / "reads.fq"), str(out), 4, True)
    com.set_header(True)
    com.vectorise()
    assert out.read_bytes() == (test_data / "expected_fa_header.kmers").read_bytes()


def test_oligo_header_values():
    com = OligoComputer("x.fq", "y", 4, True)
    header = com.get_header()
    assert header[0] == "AAAA"
    assert header[135] == "TTAA"
    com_raw = OligoComputer("x.fq", "y", 4, False)
    raw = com_raw.get_header()
    assert raw[0] == "AAAA"
    assert raw[-1] == "TTTT"
    assert len(raw) == 256


def test_oligo_small_batches_match(tmp_path, test_data):
    """Splitting into tiny batches must not change output (determinism
    under 'parallelism', the analog of oligo.rs:326-342)."""
    ref = tmp_path / "ref.kmers"
    com = OligoComputer(str(test_data / "reads.fq"), str(ref), 4, True)
    com.vectorise()
    small = tmp_path / "small.kmers"
    com2 = OligoComputer(str(test_data / "reads.fq"), str(small), 4, True)
    com2.set_max_memory(1 << 14)
    com2.vectorise()
    assert ref.read_bytes() == small.read_bytes()


def test_oligo_long_read_split(tmp_path):
    """A read longer than the max row width must produce the same vector
    as the same read unsplit (row-overlap correctness)."""
    rng = np.random.default_rng(3)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, size=20000))
    fa = tmp_path / "long.fa"
    fa.write_text(f">r1\n{seq}\n")
    out = tmp_path / "long.kmers"
    com = OligoComputer(str(fa), str(out), 4, True)
    com.set_norm(False)
    com.vectorise()
    counts = np.array(out.read_text().split(), dtype=np.int64)
    # brute force
    from kmertools_tpu.utils import codec

    pos_map, _, kcount = codec.kmer_pos_maps(4)
    expect = np.zeros(kcount, dtype=np.int64)
    s = seq.encode()
    for i in range(len(s) - 3):
        f, r = codec.kmer_to_numeric(s[i : i + 4].decode())
        expect[pos_map[min(f, r)]] += 1
    assert (counts == expect).all()
