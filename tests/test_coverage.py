"""Coverage golden parity (coverage/src/lib.rs:187-242 equivalents).

Note: test_data/expected_fq_cov.kmers is referenced by no test or code
path in the reference repo (its totals imply an obsolete both-strands
rule), so the authoritative goldens are expected_counts{,_unnorm}.vectors.
"""

from kmertools_tpu.workloads.coverage import CovComputer


def test_coverage_golden(tmp_path, test_data):
    cov = CovComputer(str(test_data / "reads.fq"), str(tmp_path), 4, 2, 3)
    cov.build_table()
    cov.compute_coverages()
    assert (tmp_path / "kmers.vectors").read_bytes() == (
        test_data / "expected_counts.vectors"
    ).read_bytes()


def test_coverage_unnorm_golden(tmp_path, test_data):
    cov = CovComputer(str(test_data / "reads.fq"), str(tmp_path), 4, 2, 3)
    cov.set_norm(False)
    cov.build_table()
    cov.compute_coverages()
    assert (tmp_path / "kmers.vectors").read_bytes() == (
        test_data / "expected_counts_unnorm.vectors"
    ).read_bytes()


def test_coverage_alt_input(tmp_path, test_data):
    """-a/--alt-input: count table from a different file
    (coverage/src/lib.rs:61-63, args.rs:311-313)."""
    cov = CovComputer(str(test_data / "reads.fq"), str(tmp_path), 4, 2, 3)
    cov.set_kmer_path(str(test_data / "reads.fa"))
    cov.build_table()
    cov.compute_coverages()
    assert (tmp_path / "kmers.vectors").read_bytes() == (
        test_data / "expected_counts.vectors"
    ).read_bytes()
